"""SPH_CHUNK / SUPER tuning sweep for the 64k-field ordered walk (VERDICT
r2 #4 closing: per-ray cost vs scene_500 target 2-3x, was 4.2x at
1024/8). Run one config per process (the pallas jit caches bake the module
constants): python experiments/chunk_tuning_bench.py CHUNK SUPER."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import raytracer_tpu.ops.pallas_intersect as pi

pi.SPH_CHUNK = int(sys.argv[1])
pi.SUPER = int(sys.argv[2])

from raytracer_tpu.models import path_tracer as pt
from raytracer_tpu.scene.builtin import sphere_field


def timeit(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


sc = sphere_field(65536)
n = 960 * 1024
rng = np.random.default_rng(0)
o_i = jnp.asarray(rng.uniform(-60, 60, (n, 3)).astype(np.float32))
d_i = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
dt_c, h = timeit(pi.intersect_pallas, sc, o_i, d_i, 1e-3, 3e38)
kw = dict(width=800, height=600, spp=32, spp_chunk=2, max_depth=16,
          t_min=1e-3, spawn_eps_rel=1e-4, intersector="pallas",
          russian_roulette=True)
dt_r, (img, rays) = timeit(pt.render_fn, sc, jax.random.PRNGKey(1),
                           reps=2, **kw)
print(f"chunk={pi.SPH_CHUNK} super={pi.SUPER}: cast960k {dt_c*1e3:6.1f} ms"
      f"  render {dt_r:5.2f} s ({int(rays)/dt_r/1e6:5.1f} Mrays/s)"
      f"  mean={float(jnp.mean(img)):.5f}", flush=True)
