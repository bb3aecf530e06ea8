"""Tri-walk TILE A/B on mesh124k (round 5).

BENCH_local_r4's mesh124k 6.28 s/8spp was measured in the TILE-256 era;
the TILE 512 commit (0be03a0) re-validated field64k (6.63 -> 6.06) but
never re-ran the 124k-tri mesh — round-5's sort=0 measurement shows
10.7 s at 512, i.e. the tri walk regressed ~1.7x from the tile width
alone ((tri_chunk, TILE) pair matrices double and the per-tile alive
AABB spans more pixel blocks, walking more chunks). One process per
TILE: python experiments/tri_tile_bench.py TILE [scene]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

import raytracer_tpu.ops.pallas_intersect as pi

pi.TILE = int(sys.argv[1])

from raytracer_tpu.models import path_tracer as pt
from raytracer_tpu.scene.builtin import bunny_field

scene = bunny_field(25)
kw = dict(width=800, height=600, spp=8, spp_chunk=1, max_depth=16,
          t_min=1e-3, spawn_eps_rel=1e-4, intersector="pallas",
          russian_roulette=True)
img, rays = pt.render_fn(scene, jax.random.PRNGKey(0), **kw)
jax.block_until_ready(img)
best = 1e30
for _ in range(2):
    t0 = time.perf_counter()
    img, rays = pt.render_fn(scene, jax.random.PRNGKey(0), **kw)
    jax.block_until_ready(img)
    best = min(best, time.perf_counter() - t0)
print(f"TILE={pi.TILE} mesh124k {best:7.3f} s/8spp  "
      f"{int(rays)/best/1e6:6.2f} Mrays/s  "
      f"mean={float(np.asarray(img).mean()):.5f}", flush=True)
