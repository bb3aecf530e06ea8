"""Benchmark harness (driver-run on real TPU hardware).

Headline metric (BASELINE.md): Mrays/s/chip rendering data/scene_500.json
at 800x600; also reports extrapolated wall-clock to 1000 spp. Rays counted
= executed ray-bounce intersections + primaries (SURVEY.md §5.5 — the
north-star counts work actually done, not just primaries).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
vs_baseline is against the 100 Mrays/s/chip target (the reference publishes
no numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time


def main():
    import jax
    import numpy as np
    from raytracer_tpu.models import path_tracer as pt
    from raytracer_tpu.scene.loader import load_scene

    width, height = 800, 600
    spp_timed = 32          # timed sample count (steady-state throughput)
    spp_chunk = 2
    max_depth = 16

    scene = load_scene("data/scene_500.json", aspect_ratio=width / height)
    key = jax.random.PRNGKey(0)

    kw = dict(width=width, height=height, spp=spp_timed, spp_chunk=spp_chunk,
              max_depth=max_depth, t_min=1e-3, spawn_eps_rel=1e-4,
              intersector="auto")

    # headline: pure throughput, no Russian roulette (alive-lane count is
    # then an honest denominator)
    img, rays = pt.render_fn(scene, key, russian_roulette=False, **kw)
    jax.block_until_ready(img)  # warmup/compile
    t0 = time.time()
    img, rays = pt.render_fn(scene, jax.random.PRNGKey(1),
                             russian_roulette=False, **kw)
    jax.block_until_ready(img)
    dt = time.time() - t0

    # production config: RR on (unbiased) — faster wall-clock per spp
    img2, _ = pt.render_fn(scene, key, russian_roulette=True, **kw)
    jax.block_until_ready(img2)
    t0 = time.time()
    img2, _ = pt.render_fn(scene, jax.random.PRNGKey(1),
                           russian_roulette=True, **kw)
    jax.block_until_ready(img2)
    dt_rr = time.time() - t0

    n_chips = 1  # bench environment exposes a single chip
    rays_total = int(rays)
    mrays = rays_total / dt / 1e6 / n_chips

    result = {
        "metric": "Mrays/s/chip scene_500 800x600 (wavefront PT, depth<=16)",
        "value": round(mrays, 2),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / 100.0, 3),
        "wallclock_s_per_32spp": round(dt, 3),
        "wallclock_s_per_32spp_rr": round(dt_rr, 3),
        "extrapolated_s_to_1000spp": round(dt_rr * (1000 / spp_timed), 1),
        "rays_traced": rays_total,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
