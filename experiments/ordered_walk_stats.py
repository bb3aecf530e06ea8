"""Per-tile chunk-walk statistics for the ordered intersect kernel.

Captures realistic wavefront states for the 64k sphere field (block-tiled
primary rays, then a simulated diffuse bounce) and reports the
distribution of chunks walked / chunk bodies run per tile, plus cast
times. This is the tuning loop for the round-3 large-scene work.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import raytracer_tpu.ops.pallas_intersect as pi

pi.ORDER_STATS = True

from raytracer_tpu.models.wavefront_soa import block_order, camera_rays_soa
from raytracer_tpu.scene.builtin import sphere_field


def cast(sc, o, d, alive, label):
    h = pi.intersect_pallas(sc, o, d, 1e-3, 3e38, alive=alive)
    jax.block_until_ready(h.t)
    t0 = time.perf_counter()
    h = pi.intersect_pallas(sc, o, d, 1e-3, 3e38, alive=alive)
    jax.block_until_ready(h.t)
    dt = time.perf_counter() - t0
    walked, bodies = (np.asarray(s) for s in pi._last_order_stats)
    hits = np.isfinite(np.asarray(h.t))
    print(f"{label}: {dt*1e3:.1f} ms  hits={hits.mean():.3f}  "
          f"walked mean={walked.mean():.1f} p50={np.median(walked):.0f} "
          f"p90={np.percentile(walked, 90):.0f} max={walked.max()}  "
          f"bodies mean={bodies.mean():.1f} p50={np.median(bodies):.0f} "
          f"p90={np.percentile(bodies, 90):.0f} max={bodies.max()}",
          flush=True)
    return h


def main():
    print("backend:", jax.default_backend(), flush=True)
    W, H = 800, 600
    sc = sphere_field(65536)
    key = jax.random.PRNGKey(3)
    perm, _ = block_order(W, H)
    n = W * H * 2  # 2 lanes per pixel, block-tiled like the renderer
    pix = jnp.asarray(perm)[jnp.arange(n, dtype=jnp.int32) % (W * H)]
    px = (pix % W).astype(jnp.float32)
    py = (pix // W).astype(jnp.float32)
    ox, oy, oz, dx, dy, dz = camera_rays_soa(sc.camera, key, px, py, W, H)
    o = jnp.stack([ox, oy, oz], -1)
    d = jnp.stack([dx, dy, dz], -1)
    alive = jnp.ones((n,), jnp.float32)

    h = cast(sc, o, d, alive, "primary      ")

    # simulated diffuse bounce: spawn at hit points, cosine-ish dirs,
    # dead lanes (misses) keep their stale primary rays like the regen
    # loop between refills
    hit = jnp.isfinite(h.t)
    t = jnp.where(hit, h.t, 0.0)
    p = o + t[:, None] * d
    k2 = jax.random.split(key, 2)[1]
    u = jax.random.uniform(k2, (n, 2))
    z = 1.0 - 2.0 * u[:, 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u[:, 1]
    nd = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)
    o2 = jnp.where(hit[:, None], p + 1e-3 * nd, o)
    d2 = jnp.where(hit[:, None], nd, d)
    cast(sc, o2, d2, alive, "bounce all   ")
    cast(sc, o2, d2, hit.astype(jnp.float32), "bounce hitonly")


if __name__ == "__main__":
    main()
