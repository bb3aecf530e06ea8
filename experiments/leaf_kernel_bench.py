"""Microbenchmark: leaf-traversal kernel vs brute-force kernel on real TPU.

Measures per-bounce kernel time on (a) coherent primary wavefronts and
(b) incoherent diffuse-bounce wavefronts, at several alive fractions, plus
an end-to-end scene_500 render. Run on the TPU host:
    python experiments/leaf_kernel_bench.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytracer_tpu.models.camera import camera_rays
from raytracer_tpu.ops.pallas_bvh import build_leaf_tables, intersect_leaf
from raytracer_tpu.ops.pallas_intersect import intersect_pallas
from raytracer_tpu.scene.loader import load_scene

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
N = 960_000


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / reps


def main():
    leaf_size = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    k_slots = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    scene = load_scene(os.path.join(DATA, "scene_500.json"))
    lscene = scene._replace(leaf=build_leaf_tables(
        scene, leaf_size=leaf_size, k_slots=k_slots))
    print(f"LEAF={leaf_size} K={k_slots} L={lscene.leaf.aabb.shape[1]} "
          f"big={int((np.asarray(lscene.leaf.big[3]) < 1e37).sum())}")

    key = jax.random.PRNGKey(0)
    # primary wavefront (coherent, pixel-major)
    pix = jnp.arange(N, dtype=jnp.int32) % (800 * 600)
    o_p, d_p = camera_rays(scene.camera, key, pix, 800, 600)

    # incoherent wavefront: random origins inside the scene, random dirs
    rng = np.random.default_rng(0)
    o_i = jnp.asarray(rng.uniform([-11, 0.2, -11], [11, 2.0, 11], (N, 3)),
                      jnp.float32)
    d_i = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)

    brute = jax.jit(lambda o, d: intersect_pallas(scene, o, d, 1e-3, jnp.inf))
    leaf = jax.jit(lambda o, d, al: intersect_leaf(
        lscene, o, d, 1e-3, jnp.inf, alive=al))

    ones = jnp.ones((N,), jnp.float32)
    for name, o, d in (("primary ", o_p, d_p), ("incoher.", o_i, d_i)):
        tb = timeit(brute, o, d)
        tl = timeit(leaf, o, d, ones)
        print(f"{name}: brute {tb*1e3:7.1f} ms  leaf {tl*1e3:7.1f} ms  "
              f"speedup {tb/tl:5.2f}x")
        for frac in (0.5, 0.25, 0.1):
            al = jnp.asarray(rng.random(N) < frac, jnp.float32)
            ta = timeit(leaf, o, d, al)
            print(f"          alive={frac:4.2f}: leaf {ta*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
