"""Megakernel v2 (whole regen-loop body in one pallas call) vs the XLA
body with the fused bounce kernel — real-chip timing for the default-on
decision. Run fresh per mode if module globals change; the env gate
RAYTRACER_TPU_REGEN_FUSED is read at render time, so one process is fine.

Usage: python experiments/regen_megakernel_bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def timed(fn, *a, **k):
    out = jax.block_until_ready(fn(*a, **k))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*a, **k))
    return out, time.perf_counter() - t0


def main():
    from raytracer_tpu.models import path_tracer as pt
    from raytracer_tpu.scene.loader import load_scene
    from raytracer_tpu.scene.builtin import cornell_box

    width, height = 800, 600
    key = jax.random.PRNGKey(1)
    scenes = {
        "scene_500": load_scene("data/scene_500.json",
                                aspect_ratio=width / height),
        "scene_10": load_scene("data/scene_10.json",
                               aspect_ratio=width / height),
        "cornell": cornell_box(with_mesh=True,
                               aspect_ratio=width / height),
    }
    for name, scene in scenes.items():
        for rr in (False, True):
            row = {}
            for gate in ("0", "1"):
                os.environ["RAYTRACER_TPU_REGEN_FUSED"] = gate
                jax.clear_caches()  # the gate is baked into jit traces
                kw = dict(width=width, height=height, spp=32, spp_chunk=1,
                          max_depth=16, t_min=1e-3, spawn_eps_rel=1e-4,
                          intersector="pallas", russian_roulette=rr)
                (img, rays), dt = timed(pt.render_fn, scene, key, **kw)
                row[gate] = (int(rays) / dt / 1e6, dt,
                             float(np.asarray(img).mean()))
            m0, t0_, mean0 = row["0"]
            m1, t1_, mean1 = row["1"]
            print(f"{name:10s} rr={int(rr)}  xla-body {m0:7.2f} Mrays/s "
                  f"({t0_:.3f} s)  megakernel {m1:7.2f} Mrays/s "
                  f"({t1_:.3f} s)  speedup {t0_ / t1_:.3f}x  "
                  f"means {mean0:.6f}/{mean1:.6f}")


if __name__ == "__main__":
    main()
