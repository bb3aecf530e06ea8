"""Measure the volumetric-media path (VERDICT r3 weak #7 / r5 item 3).

Round 5 brought media onto the SoA wavefront (apply_media_soa free-flight
override per bounce; the fused megakernel stays excluded, so media scenes
run the UNFUSED SoA loop). This bench publishes all three points on the
config-4 scene class: plain Cornell (fused kernel path), cornell_smoke on
the SoA path (production), and cornell_smoke forced onto the (N,3) XLA
AoS wavefront (the pre-round-5 fallback), same resolution/spp/depth.

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


def timed(scene, label, intersector="auto"):
    kw = dict(width=W, height=H, spp=SPP, spp_chunk=4, max_depth=16,
              t_min=1e-3, spawn_eps_rel=1e-4, intersector=intersector)
    img, rays = render_fn(scene, jax.random.PRNGKey(0), **kw)
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    img, rays = render_fn(scene, jax.random.PRNGKey(1), **kw)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    print(f"{label:30s} {dt:7.2f} s   {int(rays)/dt/1e6:7.2f} Mrays/s  "
          f"mean={float(np.asarray(img).mean()):.5f}", flush=True)
    return dt


def main():
    base = timed(cornell_box(), "cornell (fused kernel)")
    smoke = timed(cornell_smoke(), "cornell_smoke (SoA media)")
    aos = timed(cornell_smoke(), "cornell_smoke (AoS forced)",
                intersector="bruteforce")
    print(f"media tax (SoA vs cornell): {smoke / base:.2f}x   "
          f"SoA speedup vs AoS fallback: {aos / smoke:.2f}x", flush=True)


if __name__ == "__main__":
    main()
