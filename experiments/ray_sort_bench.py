"""Morton ray-sort A/B on the large-scene walks (rounds 4-5).

Bounce wavefronts are incoherent: a ray tile's alive-origin AABB spans
the whole scene, so the ordered superchunk walk's near-to-far order and
reach cull degrade (ROUND_NOTES: bounce tiles walked 72/72 chunks vs
primary 6.6/9). wavefront_soa.bounce_step(sort=True) permutes lanes into
Morton-of-origin order around the kernel call (bit-identical results —
uniforms travel with the lanes) so tiles stay spatially tight and dead
lanes compact into whole skippable tiles.

Round-5 rewrite: drive pt.render_fn with EXACTLY bench.py's config
(spawn_eps_rel=1e-4 — the round-4 version passed an absolute 1e-3,
~60x too small at field scale, which inflated paths with self-
intersection acne and invalidated its numbers; it was also never run
on the real chip, VERDICT r4 weak #1).

Usage: python experiments/ray_sort_bench.py [field64k|field160k|mesh124k]
Runs sort=0 then sort=1 for the named scene (default field64k); one
scene per process keeps dispatches short for the TPU tunnel.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

SCENES = {
    "field64k": ("sphere_field", 65536, 32),
    "field160k": ("sphere_field", 163840, 8),
    "mesh124k": ("bunny_field", 25, 8),
}


def run(mode: str, name: str):
    os.environ["RAYTRACER_TPU_RAY_SORT"] = mode
    jax.clear_caches()
    from raytracer_tpu.models import path_tracer as pt
    from raytracer_tpu.scene import builtin

    ctor, arg, spp = SCENES[name]
    scene = getattr(builtin, ctor)(arg)
    kw = dict(width=800, height=600, spp=spp, spp_chunk=1, max_depth=16,
              t_min=1e-3, spawn_eps_rel=1e-4, intersector="pallas",
              russian_roulette=True)
    img, rays = pt.render_fn(scene, jax.random.PRNGKey(0), **kw)
    jax.block_until_ready(img)
    best = 1e30
    for _ in range(2):
        t0 = time.perf_counter()
        img, rays = pt.render_fn(scene, jax.random.PRNGKey(0), **kw)
        jax.block_until_ready(img)
        best = min(best, time.perf_counter() - t0)
    mean = float(np.asarray(img).mean())
    print(f"sort={mode} {name:9s} {best:7.3f} s/{spp}spp  "
          f"{int(rays)/best/1e6:6.2f} Mrays/s  mean={mean:.5f}",
          flush=True)
    return best


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "field64k"
    off = run("0", name)
    on = run("1", name)
    print(f"{name}: off {off:.3f} s / on {on:.3f} s -> "
          f"sort costs {on / off:.2f}x", flush=True)


if __name__ == "__main__":
    main()
