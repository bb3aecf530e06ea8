"""Ordered dynamic chunk walk vs static two-level scan (round 3).

Measures, on the real chip:
- raw cast time over the 64k sphere field (coherent and incoherent rays),
- field64k 32spp RR render wall-clock (the bench.py large-scene metric),
- scene_500 RR render (headline regression guard; static path, k=1).

Usage: python experiments/ordered_walk_bench.py [--static] [--casts-only]
  --static disables the ordered path (ORDER_MIN_CHUNKS = inf) so the same
  script run twice gives the A/B.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import raytracer_tpu.ops.pallas_intersect as pi

if "--static" in sys.argv:
    pi.ORDER_MIN_CHUNKS = 10 ** 9
    print("mode: STATIC (ordered walk disabled)", flush=True)
else:
    print("mode: ORDERED", flush=True)

from raytracer_tpu.models import path_tracer as pt
from raytracer_tpu.scene.builtin import sphere_field
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


def main():
    print("backend:", jax.default_backend(), flush=True)
    sc = sphere_field(65536)

    n = 960 * 1024
    rng = np.random.default_rng(0)
    if "--renders-only" in sys.argv:
        _renders()
        return
    o_i = jnp.asarray(rng.uniform(-60, 60, (n, 3)).astype(np.float32))
    d_i = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    dt, h = timeit(pi.intersect_pallas, sc, o_i, d_i, 1e-3, 3e38)
    print(f"incoherent cast 960k: {dt*1e3:.1f} ms "
          f"({n/dt/1e6:.1f} Mrays/s) "
          f"hits={np.isfinite(np.asarray(h.t)).mean():.3f}", flush=True)

    o_c = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -120.0], jnp.float32),
                           (n, 3))
    dirs = (rng.normal(size=(n, 3)) * np.array([0.25, 0.25, 0.02])
            + np.array([0, 0, 1.0]))
    d_c = jnp.asarray(dirs.astype(np.float32))
    dt, h = timeit(pi.intersect_pallas, sc, o_c, d_c, 1e-3, 3e38)
    print(f"coherent cast 960k:   {dt*1e3:.1f} ms "
          f"({n/dt/1e6:.1f} Mrays/s) "
          f"hits={np.isfinite(np.asarray(h.t)).mean():.3f}", flush=True)
    if "--casts-only" in sys.argv:
        return
    _renders()


def _renders():
    sc = sphere_field(65536)
    key = jax.random.PRNGKey(1)

    def run(scene, label, reps=2):
        kw = dict(width=800, height=600, spp=32, spp_chunk=2, max_depth=16,
                  t_min=1e-3, spawn_eps_rel=1e-4, intersector="pallas",
                  russian_roulette=True)
        dt, (img, rays) = timeit(pt.render_fn, scene, key, reps=reps, **kw)
        print(f"{label}: {dt:.2f} s  ({int(rays)/dt/1e6:.1f} Mrays/s)  "
              f"mean={float(jnp.mean(img)):.5f}", flush=True)

    run(sc, "field64k 800x600 32spp RR")
    sc5 = load_scene("data/scene_500.json", aspect_ratio=800 / 600)
    run(sc5, "scene_500 800x600 32spp RR")


if __name__ == "__main__":
    main()
