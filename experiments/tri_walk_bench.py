"""Tri ordered superchunk walk: A/B vs forced-static scan on the chip.

Measures bunny_field(25) (124,200 tris, 3 TRI_SLAB chunks) at 800x600
32spp RR with the ordered walk on vs off, plus bun315 Cornell-free solo
mesh as the single-slab case. With --save, writes docs/images/bunny_field.png from the
ordered run.

Usage: python experiments/tri_walk_bench.py [--static]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

import raytracer_tpu.ops.pallas_intersect as pi

STATIC = "--static" in sys.argv
SAVE = "--save" in sys.argv    # gate the docs artifact (ADVICE r3: no side effects)
if STATIC:
    pi.ORDER_MIN_CHUNKS = 10 ** 9
print("mode:", "STATIC" if STATIC else "ORDERED", flush=True)

from raytracer_tpu.models import path_tracer as pt
from raytracer_tpu.scene.builtin import bunny_field


def timed(fn, *a, **kw):
    out = fn(*a, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*a, **kw)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0


def main():
    key = jax.random.PRNGKey(1)
    scene = bunny_field(25)
    kw = dict(width=800, height=600, spp=32, spp_chunk=1, max_depth=16,
              t_min=1e-3, spawn_eps_rel=1e-4, intersector="auto",
              russian_roulette=True)
    (img, rays), dt = timed(pt.render_fn, scene, key, **kw)
    img = np.asarray(img)
    print(f"bunny_field(25) 800x600 32spp RR: {dt:.2f} s  "
          f"{int(rays) / dt / 1e6:.2f} Mrays/s  mean={img.mean():.5f}",
          flush=True)
    if SAVE and not STATIC:
        from raytracer_tpu.utils.image import save_render
        save_render("docs/images/bunny_field.png", img)
        print("wrote docs/images/bunny_field.png", flush=True)


if __name__ == "__main__":
    main()
