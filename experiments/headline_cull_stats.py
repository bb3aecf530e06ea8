"""Per-chunk cull hit rates for scene_500's static sphere scan
(VERDICT r5 item 6: publish the selectivity data the chunk decisions
rest on).

The static fused scan visits a sphere chunk when (a) any ray in the
TILE-wide lane tile slab-hits the chunk AABB with t < that lane's
running best_t (the `leave` bound). This harness reproduces exactly
that tile-level test host-side for realistic wavefronts — block-tiled
primary rays, then a simulated diffuse bounce — and reports, per
chunk, the fraction of tiles that would run its body. CPU-safe (no
pallas): run with JAX_PLATFORMS=cpu alongside TPU jobs.

Usage: python experiments/headline_cull_stats.py [scene] [chunk] [tile]
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

import raytracer_tpu.ops.pallas_intersect as pi

scene_name = sys.argv[1] if len(sys.argv) > 1 else "scene_500"
CHUNKS = ([int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2
          else [pi.SPH_CHUNK])
TILES = ([int(x) for x in sys.argv[3].split(",")] if len(sys.argv) > 3
         else [pi.TILE_SPH])

from raytracer_tpu.models.wavefront_soa import block_order, camera_rays_soa
from raytracer_tpu.ops import intersect as ix
from raytracer_tpu.scene.loader import load_scene
from raytracer_tpu.scene.builtin import sphere_field


def tile_cull_rates(sc, o, d, best_t, label, TILE):
    """Fraction of ray tiles whose slab test enters each chunk, under the
    same (slab AND t_near < leave) bound the kernel uses."""
    sph, _, _, cull, _, _, _ = pi.pack_tables(sc)
    k_ch = cull.shape[1]
    n = o.shape[0]
    n_pad = -(-n // TILE) * TILE
    o = jnp.pad(o, [(0, n_pad - n), (0, 0)])
    d = jnp.pad(d, [(0, n_pad - n), (0, 0)], constant_values=1e-9)
    bt = jnp.pad(best_t, [(0, n_pad - n)])
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)      # (N,3)
    lo = cull[0:3].T[:, None, :]                             # (k,1,3)
    hi = cull[3:6].T[:, None, :]
    t0 = (lo - o[None]) * inv[None]                          # (k,N,3)
    t1 = (hi - o[None]) * inv[None]
    tn = jnp.minimum(t0, t1).max(-1)                         # (k,N)
    tf = jnp.maximum(t0, t1).min(-1)
    hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < bt[None])
    per_tile = hit.reshape(k_ch, -1, TILE).any(-1)           # (k,tiles)
    rates = np.asarray(per_tile.mean(-1))
    bodies = rates.sum()
    per = (f"per-chunk=[{', '.join(f'{r:.2f}' for r in rates)}]"
           if k_ch <= 8 else
           f"pairs/ray={bodies * pi.SPH_CHUNK:.0f}")
    print(f"{label}: chunks={k_ch} tile={TILE} "
          f"entered/tile mean={bodies:.2f}/{k_ch} {per}", flush=True)
    return rates


def main():
    W, H = 800, 600
    if scene_name.startswith("field"):
        sc = sphere_field(int(scene_name[5:]))
    else:
        sc = load_scene(f"data/{scene_name}.json", aspect_ratio=W / H)
    key = jax.random.PRNGKey(3)
    perm, _ = block_order(W, H)
    n = W * H
    pix = jnp.asarray(perm)[jnp.arange(n, dtype=jnp.int32)]
    px = (pix % W).astype(jnp.float32)
    py = (pix // W).astype(jnp.float32)
    ox, oy, oz, dx, dy, dz = camera_rays_soa(sc.camera, key, px, py, W, H)
    o = jnp.stack([ox, oy, oz], -1)
    d = jnp.stack([dx, dy, dz], -1)

    h = ix.intersect_bruteforce(sc, o, d, 1e-3, 3e38)
    hit = jnp.isfinite(h.t)
    print(f"{scene_name}: n_sph={int(sc.spheres.radius.shape[0])} "
          f"primary hit rate={float(hit.mean()):.3f}", flush=True)

    # simulated diffuse bounce wavefront (regen keeps dead lanes' stale
    # rays; hit lanes respawn at p with uniform-sphere-ish dirs)
    t = jnp.where(hit, h.t, 0.0)
    p = o + t[:, None] * d
    u = jax.random.uniform(jax.random.split(key, 2)[1], (n, 2))
    z = 1.0 - 2.0 * u[:, 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u[:, 1]
    nd = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)
    o2 = jnp.where(hit[:, None], p + 1e-3 * nd, o)
    d2 = jnp.where(hit[:, None], nd, d)
    h2 = ix.intersect_bruteforce(sc, o2, d2, 1e-3, 3e38)
    hit2 = jnp.isfinite(h2.t)
    print(f"bounce hit rate={float(hit2.mean()):.3f}", flush=True)

    big = jnp.full((n,), 3e38, jnp.float32)
    bt = jnp.where(hit, h.t, 3e38)
    bt2 = jnp.where(hit2, h2.t, 3e38)
    for chunk in CHUNKS:
        pi.SPH_CHUNK = chunk
        for TILE in TILES:
            tile_cull_rates(sc, o, d, bt,
                            "primary post-hit (best_t=t*)  ", TILE)
            tile_cull_rates(sc, o2, d2, bt2,
                            "bounce post-hit (best_t=t*)   ", TILE)


if __name__ == "__main__":
    main()
