"""Reach-clamp A/B on SLABBED scenes (round 3).

On single-slab scenes the stage AABB covers the whole screen and the clamp
is a wash (experiments/reach_clamp_bench.py: 7.38 s both ways). Slabbed
tables are the interesting case: each Morton slab's stage AABB covers a
spatial SUBSET, so lanes that miss it get t_cap = 0 and skip the whole
walk's member tests.

Usage: python experiments/reach_clamp_slabbed.py [--noclamp]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

import raytracer_tpu.ops.pallas_intersect as pi

if "--noclamp" in sys.argv:
    pi.REACH_CLAMP = False
print("mode:", "CLAMP" if pi.REACH_CLAMP else "NOCLAMP", flush=True)

from raytracer_tpu.models import path_tracer as pt
from raytracer_tpu.scene.builtin import bunny_field, sphere_field


def timed(fn, *a, reps=2, **kw):
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
    kw = dict(width=800, height=600, spp=8, spp_chunk=1, max_depth=16,
              t_min=1e-3, spawn_eps_rel=1e-4, intersector="auto",
              russian_roulette=True)
    for name, scene in (("bunny_field(25) 124k tris", bunny_field(25)),
                        ("sphere_field(163840)", sphere_field(163840))):
        (img, rays), dt = timed(pt.render_fn, scene, key, **kw)
        img = np.asarray(img)
        print(f"{name} 800x600 8spp RR: {dt:.2f} s  "
              f"{int(rays)/dt/1e6:.2f} Mrays/s  mean={img.mean():.6f}",
              flush=True)


if __name__ == "__main__":
    main()
