"""Ordered-walk chunk sweep AT HEADLINE SCALE (scene_500, 1005 spheres).

The round-3 chunk/SUPER sweep (chunk_tuning_bench.py) settled 1024/8 for
the 64k field, but scene_500 packs into a SINGLE 1024-wide chunk — the
headline render culls nothing and every ray tests all 1005 spheres. With
a smaller chunk the table splits into Morton-ordered chunks the per-tile
near-to-far walk can skip (primary tiles see a handful of spheres; the
walk exits at best-t). This sweep asks whether that beats the dense scan
at 1k scale, where the per-chunk overhead amortizes over far less work
than at 64k.

Run one config per process (pallas jit caches bake the module constants):
    python experiments/headline_chunk_bench.py CHUNK SUPER MIN_CHUNKS
Baseline first: 1024 8 16 (current constants, static single-chunk scan).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import raytracer_tpu.ops.pallas_intersect as pi

pi.SPH_CHUNK = int(sys.argv[1])
pi.SUPER = int(sys.argv[2])
pi.ORDER_MIN_CHUNKS = int(sys.argv[3])
if len(sys.argv) > 4:
    pi.TILE_SPH = int(sys.argv[4])
if len(sys.argv) > 5:
    pi.SPH_SUB = int(sys.argv[5])

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
n_s = int(sc.spheres.radius.shape[0])
chunk = pi.eff_chunk(n_s, pi.SPH_CHUNK)
k_ch = -(-n_s // chunk)
ordered = pi._wants_order(n_s, chunk)
kw = dict(width=800, height=600, spp=32, spp_chunk=2, max_depth=16,
          t_min=1e-3, spawn_eps_rel=1e-4, intersector="pallas",
          russian_roulette=True)
dt, (img, rays) = timeit(pt.render_fn, sc, jax.random.PRNGKey(1),
                         reps=3, **kw)
kwn = dict(kw, russian_roulette=False)
dtn, (imgn, raysn) = timeit(pt.render_fn, sc, jax.random.PRNGKey(1),
                            reps=2, **kwn)
print(f"chunk={pi.SPH_CHUNK} super={pi.SUPER} min={pi.ORDER_MIN_CHUNKS} "
      f"tile={pi.TILE_SPH} sub={pi.SPH_SUB} "
      f"(n={n_s} k_ch={k_ch} ordered={ordered}): "
      f"RR {dt:5.2f} s ({int(rays)/dt/1e6:5.1f} Mrays/s)  "
      f"noRR {dtn:5.2f} s ({int(raysn)/dtn/1e6:5.1f} Mrays/s)  "
      f"mean={float(jnp.mean(img)):.5f}", flush=True)
