"""Measure the volumetric-media slow path (VERDICT r3 weak #7).

Scenes with ConstantMedium fall off the SoA/regen kernel path to the
(N,3) XLA wavefront (path_tracer.trace_radiance fallback). This bench
quantifies that tax on the config-4 scene class: cornell_smoke (Cornell
walls + two smoke volumes) vs plain Cornell, same resolution/spp/depth,
real chip.

Usage: python experiments/media_path_bench.py [--small]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from raytracer_tpu.models.path_tracer import render_fn
from raytracer_tpu.scene.builtin import cornell_box, cornell_smoke

SMALL = "--small" in sys.argv
W, H, SPP = (200, 200, 8) if SMALL else (400, 400, 32)


def timed(scene, label):
    kw = dict(width=W, height=H, spp=SPP, spp_chunk=4, max_depth=16,
              t_min=1e-3, spawn_eps_rel=1e-4)
    img, rays = render_fn(scene, jax.random.PRNGKey(0), **kw)
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    img, rays = render_fn(scene, jax.random.PRNGKey(1), **kw)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    print(f"{label:26s} {dt:7.2f} s   {int(rays)/dt/1e6:7.2f} Mrays/s  "
          f"mean={float(np.asarray(img).mean()):.5f}", flush=True)
    return dt


def main():
    base = timed(cornell_box(), "cornell (kernel path)")
    smoke = timed(cornell_smoke(), "cornell_smoke (XLA path)")
    print(f"media-path tax: {smoke / base:.1f}x", flush=True)


if __name__ == "__main__":
    main()
