"""TILE width experiment: per-chunk _fold costs (min/iota/onehot matmul)
amortize over the ray-tile height; TILE=512 halves them per ray at the
price of looser per-tile culling (2 pixel blocks per tile) and more VMEM.
Run: python experiments/tile_width_bench.py TILE"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import raytracer_tpu.ops.pallas_intersect as pi

pi.TILE = int(sys.argv[1])

from raytracer_tpu.models import path_tracer as pt
from raytracer_tpu.scene.loader import load_scene


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


sc = load_scene("data/scene_500.json", aspect_ratio=800 / 600)
n = 960 * 1024
rng = np.random.default_rng(0)
o_i = jnp.asarray(rng.uniform(-9, 9, (n, 3)).astype(np.float32))
d_i = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
dt_c, h = timeit(pi.intersect_pallas, sc, o_i, d_i, 1e-3, 3e38)
key = jax.random.PRNGKey(1)
out = {}
for rr in (True, False):
    kw = dict(width=800, height=600, spp=32, spp_chunk=1, max_depth=16,
              t_min=1e-3, spawn_eps_rel=1e-4, intersector="pallas",
              russian_roulette=rr)
    dt, (img, rays) = timeit(pt.render_fn, sc, key, reps=2, **kw)
    out[rr] = (dt, int(rays) / dt / 1e6, float(jnp.mean(img)))
print(f"TILE={pi.TILE}: cast960k {dt_c*1e3:6.1f} ms | "
      f"RR {out[True][0]:5.2f}s {out[True][1]:5.1f}Mr/s | "
      f"noRR {out[False][0]:5.2f}s {out[False][1]:5.1f}Mr/s | "
      f"means {out[True][2]:.5f}/{out[False][2]:.5f}", flush=True)
