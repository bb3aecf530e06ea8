"""Leaf vs brute scaling with sphere count (the leaf kernel's regime)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, time
from raytracer_tpu.scene import SceneBuilder
from raytracer_tpu.ops.pallas_bvh import build_leaf_tables, intersect_leaf
from raytracer_tpu.ops.pallas_intersect import intersect_pallas

N = 960_000
rng = np.random.default_rng(0)

def make_scene(n_sph):
    b = SceneBuilder()
    m = b.lambertian(b.constant_texture((0.5, 0.5, 0.5)))
    b.add_sphere((0, -1000, 0), 1000.0, m)
    pts = rng.uniform([-11, 0.2, -11], [11, 2.0, 11], (n_sph, 3))
    for p in pts:
        b.add_sphere(tuple(p), 0.2, m)
    return b.compile()

def tm(f, *a, reps=3):
    r = f(*a); r.t.block_until_ready()
    t0=time.perf_counter()
    for _ in range(reps): r = f(*a)
    r.t.block_until_ready()
    return (time.perf_counter()-t0)/reps*1e3

o = jnp.asarray(rng.uniform([-11,0.2,-11],[11,2,11],(N,3)), jnp.float32)
d = jnp.asarray(rng.normal(size=(N,3)), jnp.float32)
ones = jnp.ones((N,), jnp.float32)
for n in (1000, 4000, 16000):
    scene = make_scene(n)
    ls = scene._replace(leaf=build_leaf_tables(scene))
    brute = jax.jit(lambda o,d: intersect_pallas(scene, o, d, 1e-3, jnp.inf))
    leaf = jax.jit(lambda o,d,al: intersect_leaf(ls, o, d, 1e-3, jnp.inf, alive=al))
    tb = tm(brute, o, d)
    tl = tm(leaf, o, d, ones)
    print(f"n={n:6d}: brute {tb:7.1f} ms  leaf {tl:7.1f} ms  "
          f"(L={ls.leaf.aabb.shape[1]})", flush=True)
