"""Morton ray-sort A/B on the large-scene walks (round 4).

Bounce wavefronts are incoherent: a ray tile's alive-origin AABB spans
the whole scene, so the ordered superchunk walk's near-to-far order and
reach cull degrade (ROUND_NOTES: bounce tiles walked 72/72 chunks vs
primary 6.6/9). wavefront_soa.bounce_step(sort=True) permutes lanes into
Morton-of-origin order around the kernel call (bit-identical results —
uniforms travel with the lanes) so tiles stay spatially tight and dead
lanes compact into whole skippable tiles.

Usage: python experiments/ray_sort_bench.py [--small]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def run(mode: str, small: bool):
    os.environ["RAYTRACER_TPU_RAY_SORT"] = mode
    jax.clear_caches()
    from raytracer_tpu.models.wavefront_soa import render_regen_soa
    from raytracer_tpu.scene.builtin import sphere_field, bunny_field

    out = {}
    for name, scene, spp in (
        ("field64k", sphere_field(65536), 8 if small else 32),
        ("mesh124k", bunny_field(25), 4 if small else 8),
    ):
        w, h = (200, 150) if small else (800, 600)
        kw = dict(width=w, height=h, lanes_per_pixel=1,
                  samples_per_lane=spp, max_depth=16, t_min=1e-3,
                  spawn_eps=1e-3, intersector="pallas",
                  russian_roulette=True)
        img, rays, _ = render_regen_soa(scene, jax.random.PRNGKey(0), **kw)
        jax.block_until_ready(img)
        t0 = time.perf_counter()
        img, rays, _ = render_regen_soa(scene, jax.random.PRNGKey(0), **kw)
        jax.block_until_ready(img)
        dt = time.perf_counter() - t0
        mean = float(np.asarray(img).mean()) / spp
        print(f"sort={mode} {name:9s} {dt:7.3f} s  "
              f"{int(rays)/dt/1e6:6.2f} Mrays/s  mean={mean:.5f}",
              flush=True)
        out[name] = dt
    return out


def main():
    small = "--small" in sys.argv
    off = run("0", small)
    on = run("1", small)
    for k in off:
        print(f"{k}: {off[k]:.3f} -> {on[k]:.3f} s "
              f"({off[k]/on[k]:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
