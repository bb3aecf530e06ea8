"""Stage-AABB reach clamp A/B (round 3).

The ordered walk's early exit compares each super's gap against
max(best_t * |d|) over alive lanes; in open scenes sky-bound lanes keep
best_t = BIG so the exit never fires on bounce wavefronts (measured:
"bounce all" walked every super). The clamp caps each lane's reach by its
exit-t from the stage's global AABB — sky lanes get a finite reach the
moment the walk starts.

Usage: python experiments/reach_clamp_bench.py [--noclamp]
Run twice (one process per mode — pallas constants bake into jit caches).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import raytracer_tpu.ops.pallas_intersect as pi

if "--noclamp" in sys.argv:
    pi.REACH_CLAMP = False
print("mode:", "CLAMP" if pi.REACH_CLAMP else "NOCLAMP", flush=True)

from raytracer_tpu.models import path_tracer as pt
from raytracer_tpu.ops.dispatch import intersect_scene
from raytracer_tpu.scene.builtin import sphere_field


def timed(fn, *a, reps=3, **kw):
    out = fn(*a, **kw)
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return out, best


def main():
    key = jax.random.PRNGKey(1)
    scene = sphere_field(65536)

    # raw casts: bounce-like incoherent wavefront INSIDE the field (worst
    # case for the exit) and an outward-heavy wavefront (best case)
    n = 960 * 1024
    ks = jax.random.split(key, 4)
    lo = np.asarray(scene.bounds_min)
    hi = np.asarray(scene.bounds_max)
    o = jax.random.uniform(ks[0], (n, 3), minval=jnp.array(lo),
                           maxval=jnp.array(hi))
    d = jax.random.normal(ks[1], (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    cast = jax.jit(lambda o, d: intersect_scene(
        scene, o, d, jnp.full((n,), 1e-3), jnp.full((n,), jnp.inf),
        method="pallas").t)
    _, dt_in = timed(cast, o, d)
    print(f"incoherent in-field cast 960k: {dt_in*1e3:.0f} ms", flush=True)

    # same origins, directions biased upward (most lanes exit the field
    # fast — the clamp's target population)
    up = d.at[:, 1].set(jnp.abs(d[:, 1]) + 1.0)
    up = up / jnp.linalg.norm(up, axis=-1, keepdims=True)
    _, dt_up = timed(cast, o, up)
    print(f"outward-biased cast 960k:     {dt_up*1e3:.0f} ms", flush=True)

    kw = dict(width=800, height=600, spp=32, spp_chunk=1, max_depth=16,
              t_min=1e-3, spawn_eps_rel=1e-4, intersector="pallas",
              russian_roulette=True)
    (img, rays), dt = timed(pt.render_fn, scene, key, reps=2, **kw)
    img = np.asarray(img)
    print(f"field64k 800x600 32spp RR render: {dt:.2f} s  "
          f"{int(rays)/dt/1e6:.2f} Mrays/s  mean={img.mean():.6f}",
          flush=True)


if __name__ == "__main__":
    main()
