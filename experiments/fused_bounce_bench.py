"""Fused bounce megakernel A/B on the real TPU (round-4 VERDICT item 1).

Round 3 measured the fused bounce OUT: its per-ray epilogue ran ~200 ops
on (TILE,1) columns at 1/128 VPU lane utilization (+31 ms/step at 960k
lanes). Round 4 transposed the kernel — rays on the lane axis — so the
same epilogue runs on (1,TILE) rows at 2 vregs/op, and the megakernel
should now REMOVE the ~8.3 ms/step XLA attrs+scatter stage instead of
adding cost. This harness settles it by measurement.

Run one mode per process (use_fused reads the env var at trace time):
    RAYTRACER_TPU_FUSED_BOUNCE=0 python experiments/fused_bounce_bench.py
    RAYTRACER_TPU_FUSED_BOUNCE=1 python experiments/fused_bounce_bench.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from raytracer_tpu.models import path_tracer as pt
from raytracer_tpu.scene.loader import load_scene
from raytracer_tpu.scene.builtin import cornell_box


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


mode = os.environ.get("RAYTRACER_TPU_FUSED_BOUNCE", "on(default)")
key = jax.random.PRNGKey(1)
kw = dict(width=800, height=600, spp=32, spp_chunk=2, max_depth=16,
          t_min=1e-3, spawn_eps_rel=1e-4, intersector="pallas",
          russian_roulette=True)

for name, sc in [
    ("scene_500", load_scene("data/scene_500.json", aspect_ratio=800 / 600)),
    ("scene_10", load_scene("data/scene_10.json", aspect_ratio=800 / 600)),
    ("cornell", cornell_box()),
]:
    dt, (img, rays) = timeit(pt.render_fn, sc, key, reps=3, **kw)
    print(f"fused={mode} {name}: {dt:6.3f} s  "
          f"{int(rays) / dt / 1e6:6.2f} Mrays/s  "
          f"mean={float(jnp.mean(img)):.6f}", flush=True)
