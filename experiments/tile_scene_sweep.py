"""TILE width validation across the bench scene set (the headline-only
tile_width_bench said 1024 > 512 on scene_500; this checks the scenes
whose tradeoffs could flip — the 64k-field ordered walk's per-tile cull
granularity, scene_10's fixed-cost regime, the 124k-tri mesh slab chain,
and motion culls). One process per TILE (module constant bakes into jit).

Run: python experiments/tile_scene_sweep.py TILE [quick]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import raytracer_tpu.ops.pallas_intersect as pi

pi.TILE = int(sys.argv[1])

from raytracer_tpu.models import path_tracer as pt
from raytracer_tpu.scene.builtin import motion_field, sphere_field
from raytracer_tpu.scene.loader import load_scene


def timeit(fn, *args, reps=2, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


key = jax.random.PRNGKey(1)
BASE = dict(t_min=1e-3, spawn_eps_rel=1e-4, intersector="pallas",
            russian_roulette=True, spp_chunk=1, max_depth=16)

jobs = [
    ("scene_10", load_scene("data/scene_10.json", aspect_ratio=400 / 225),
     dict(width=400, height=225, spp=100)),
    ("field64k", sphere_field(65536),
     dict(width=800, height=600, spp=32)),
    ("motion1k", motion_field(1000),
     dict(width=800, height=600, spp=8)),
]
if "quick" not in sys.argv:
    from raytracer_tpu.scene.builtin import bunny_field
    jobs.append(("mesh124k", bunny_field(25),
                 dict(width=800, height=600, spp=8)))

for name, sc, kw in jobs:
    dt, (img, rays) = timeit(pt.render_fn, sc, key, **BASE, **kw)
    print(f"TILE={pi.TILE} {name:9s}: {dt:6.2f}s "
          f"{int(rays) / dt / 1e6:6.2f} Mrays/s mean={float(jnp.mean(img)):.5f}",
          flush=True)
