"""Pallas TPU kernel: fixed-radius photon queries with a VMEM-resident map.

The XLA grid query (ops/photon_grid.py::query_grid) gathers a (N, 27*K, 3)
candidate tensor from HBM per map per iteration — ~GBs of traffic that made
the SPPM measurement pass HBM-bound (ROUND_NOTES round 1: ~15 GB/iter). This
kernel inverts the layout: photons live in VMEM as component planes,
measurement points stream through in 256-point tiles, and each tile runs a
dense masked distance/flux reduction over photon chunks:

- photons arrive cell-sorted (ops/photon_grid.py::build_grid order), so a
  chunk of 1024 consecutive photons is spatially compact; each chunk carries
  an AABB and the kernel cond-skips chunks farther than the tile's largest
  query radius from the tile's point bounding box (the analog of the
  intersect kernels' chunk cull — with points in image order, neighboring
  pixels shade neighboring surface points and tiles visit few chunks);
- per live chunk, the (256, 1024) pair math runs on the VPU in exact f32
  (distance, disk factor |n_ph . unit(delta)|, photon_mapper.rs:77-79) and
  the flux accumulations ride the MXU as bf16 matmuls against the power
  planes (bf16 flux rounding ~0.4% — the same compromise the grid path's
  compact payloads already make, far below MC noise); counts are exact.

Deposit arrays are photons_per_iter * max_bounces long (mostly invalid —
the sentinel sort in build_grid packs valid deposits first), far beyond
VMEM. The wrapper therefore processes the table in static SLABS of 384k
photons; slabs that start past ``n_valid`` are skipped with an XLA-level
``lax.cond`` around the whole pallas call, and the in-kernel chunk loop is
a ``fori_loop`` over dynamic VMEM slices so program size is independent of
the slab length.

Unlike the grid query there is NO per-cell candidate cap and NO 27-cell
truncation: every photon within the radius contributes, exactly matching
the reference kd-tree's ``within_radius`` semantics (photon_mapper.rs:105).
Radii may exceed one grid cell. Invalid photons carry position 3e38 (the
distance test always fails) and inverted chunk AABBs (whole chunks cull).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.ops.photon_grid import QueryResult

TILE = 256      # points per grid step
CHUNK = 1024    # photons per in-kernel chunk. 256 was measured WORSE (1179
#                 vs 907 ms/query at 800x800: per-chunk fixed costs x4 beat
#                 the tighter culling); 1024 balances cull granularity
#                 against cond/load/matmul overhead.
SLAB = 384 * 1024  # photons per kernel call (VMEM: ~4.6 MB f32 + 4.6 MB bf16)
BIG = 3.0e38


def _pack_photons(pos, power, norm, valid, chunk: int):
    """Component planes + per-chunk AABBs (trace-time XLA; tiny next to the
    kernel). Returns (posf (3,Ppad) f32, payload (6,Ppad) bf16,
    cull (6,nchunks) f32, n_valid ())."""
    p = pos.shape[0]
    p_pad = max(chunk, -(-p // chunk) * chunk)
    pad = p_pad - p

    posx = jnp.where(valid[:, None], pos, BIG).astype(jnp.float32)
    if pad:
        posx = jnp.pad(posx, [(0, pad), (0, 0)], constant_values=BIG)
        power = jnp.pad(power, [(0, pad), (0, 0)])
        norm = jnp.pad(norm, [(0, pad), (0, 0)])
    posf = posx.T                                             # (3, Ppad)
    payload = jnp.concatenate(
        [power.T, norm.T], 0).astype(jnp.bfloat16)            # (6, Ppad)

    k = p_pad // chunk
    pc = posx.reshape(k, chunk, 3)
    lo = jnp.min(jnp.where(pc < BIG, pc, BIG), axis=1).T      # (3, k)
    hi = jnp.max(jnp.where(pc < BIG, pc, -BIG), axis=1).T
    cull = jnp.concatenate([lo, hi], 0)                       # (6, k)
    return posf, payload, cull, jnp.sum(valid.astype(jnp.int32))


def _query_kernel(near_ref, pts_ref, r2_ref, cap2_ref, posf_ref,
                  payload_ref, out_ref, *, n_chunks: int, chunk: int):
    px = pts_ref[:, 0:1]                                      # (T,1)
    py = pts_ref[:, 1:2]
    pz = pts_ref[:, 2:3]
    r2 = r2_ref[:]                                            # (T,1)
    cap2 = cap2_ref[:]
    tile = pl.program_id(0)
    n_words = -(-n_chunks // 32)
    # cell-sorted photons + image-coherent points: a tile's live chunks
    # cluster in one band, so the loop runs [lo, hi) instead of all chunks.
    # Flat prefetch layout: [bits: G*n_words | ranges: 2 per tile]
    base = pl.num_programs(0) * n_words
    lo = near_ref[base + 2 * tile]
    hi = near_ref[base + 2 * tile + 1]

    def chunk_fn(j, acc):
        # per-(tile, chunk) cull bit, precomputed in XLA and passed as a
        # bit-packed scalar-prefetch array (SMEM allows dynamic scalar
        # reads but holds ~1 MB — bits keep 800x800-class images in budget)
        word = near_ref[tile * n_words + j // 32]
        near = ((word >> (j % 32)) & 1) > 0

        def body(acc):
            base = pl.multiple_of(j * chunk, chunk)
            dx = posf_ref[0:1, pl.ds(base, chunk)] - px       # (T,C)
            dy = posf_ref[1:2, pl.ds(base, chunk)] - py
            dz = posf_ref[2:3, pl.ds(base, chunk)] - pz
            d2 = dx * dx + dy * dy + dz * dz
            nx = payload_ref[3:4, pl.ds(base, chunk)].astype(jnp.float32)
            ny = payload_ref[4:5, pl.ds(base, chunk)].astype(jnp.float32)
            nz = payload_ref[5:6, pl.ds(base, chunk)].astype(jnp.float32)
            nd = nx * dx + ny * dy + nz * dz
            disk = jnp.abs(nd) * jax.lax.rsqrt(jnp.maximum(d2, 1e-20))
            s = 1.0 - disk
            in_r = d2 <= r2
            in_cap = d2 <= cap2
            # flux as bf16 MXU matmuls; counts as exact VPU row sums
            w_r = jnp.where(in_r, s, 0.0).astype(jnp.bfloat16)
            w_c = jnp.where(in_cap, s, 0.0).astype(jnp.bfloat16)
            pow3 = payload_ref[0:3, pl.ds(base, chunk)]       # (3,C) bf16
            dn = (((1,), (1,)), ((), ()))
            flux_r = jax.lax.dot_general(
                w_r, pow3, dn, preferred_element_type=jnp.float32)
            flux_c = jax.lax.dot_general(
                w_c, pow3, dn, preferred_element_type=jnp.float32)
            cnt_r = jnp.sum(in_r.astype(jnp.float32), axis=1, keepdims=True)
            cnt_c = jnp.sum(in_cap.astype(jnp.float32), axis=1,
                            keepdims=True)
            return acc + jnp.concatenate(
                [flux_r, cnt_r, flux_c, cnt_c], axis=1)

        return jax.lax.cond(near, body, lambda a: a, acc)

    out_ref[:] = jax.lax.fori_loop(
        lo, hi, chunk_fn,
        jnp.zeros((px.shape[0], 8), jnp.float32))


@functools.partial(jax.jit, static_argnames=("n_chunks", "chunk",
                                             "interpret"))
def _call_query(pts, r2, cap2, posf, payload, cull, *, n_chunks, chunk,
                interpret):
    n = pts.shape[0]
    n_pad = -(-n // TILE) * TILE
    pad = n_pad - n
    if pad:
        pts = jnp.pad(pts, [(0, pad), (0, 0)], constant_values=-BIG)
        r2 = jnp.pad(r2, [(0, pad), (0, 0)], constant_values=0.0)
        cap2 = jnp.pad(cap2, [(0, pad), (0, 0)], constant_values=0.0)
    # chunk-cull masks in XLA: tile AABB (+ largest radius) vs chunk AABB
    tp = pts.reshape(n_pad // TILE, TILE, 3)
    treach = jnp.sqrt(jnp.maximum(
        jnp.max(jnp.maximum(r2, cap2).reshape(n_pad // TILE, TILE), axis=1),
        0.0))                                                  # (G,)
    tlo = tp.min(1)                                            # (G, 3)
    thi = tp.max(1)
    clo = cull[0:3].T                                          # (K, 3)
    chi = cull[3:6].T
    gap = jnp.maximum(jnp.maximum(clo[None] - thi[:, None],
                                  tlo[:, None] - chi[None]), 0.0)
    dist2 = jnp.sum(gap * gap, axis=-1)                        # (G, K)
    nearb = (dist2 <= (treach * treach)[:, None])
    near = nearb.astype(jnp.int32)
    # per-tile live band [lo, hi): first/last set chunk (empty -> [0, 0))
    ks = jnp.arange(near.shape[1], dtype=jnp.int32)
    any_near = jnp.any(nearb, axis=1)
    lo_t = jnp.min(jnp.where(nearb, ks[None], n_chunks), axis=1)
    hi_t = jnp.max(jnp.where(nearb, ks[None] + 1, 0), axis=1)
    lo_t = jnp.where(any_near, lo_t, 0)
    hi_t = jnp.where(any_near, hi_t, 0)
    ranges = jnp.stack([lo_t, hi_t], axis=1).reshape(-1)       # (2G,)
    # bit-pack along the chunk axis (32 chunks per i32 word)
    n_words = -(-n_chunks // 32)
    near = jnp.pad(near, [(0, 0), (0, n_words * 32 - n_chunks)])
    near = jnp.sum(
        near.reshape(-1, n_words, 32) << jnp.arange(32, dtype=jnp.int32),
        axis=2, dtype=jnp.int32)                               # (G, W)

    rs = lambda w: pl.BlockSpec((TILE, w), lambda i, near: (i, 0),
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_query_kernel, n_chunks=n_chunks, chunk=chunk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // TILE,),
            in_specs=[rs(3), rs(1), rs(1)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=rs(8)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=n_pad * n_chunks * chunk // 4 * 20,
            bytes_accessed=n_pad * 50 + posf.size * 4,
            transcendentals=n_pad * chunk),
        interpret=interpret,
    )(jnp.concatenate([near.reshape(-1), ranges]), pts, r2, cap2, posf,
      payload)
    out = out[:n]
    return QueryResult(flux_r=out[:, 0:3], count_r=out[:, 3],
                       flux_cap=out[:, 4:7], count_cap=out[:, 7])


def query_photons(pos, power, norm, valid, points, radius, cap_radius,
                  chunk: int = CHUNK, slab: int = SLAB) -> QueryResult:
    """Dense dual-radius photon query (drop-in for
    photon_grid.query_grid_chunked, without its per-cell candidate cap).

    ``pos/power/norm`` (P,3) photons with a (P,) validity mask. Cell-sorted,
    valid-first order (build_grid's) makes both the chunk cull and the slab
    skip effective; any order is correct."""
    n = points.shape[0]
    r = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (n,))[:, None]
    cap = jnp.broadcast_to(jnp.asarray(cap_radius, jnp.float32), (n,))[:, None]
    posf, payload, cull, n_valid = _pack_photons(pos, power, norm, valid,
                                                 chunk)
    interpret = jax.default_backend() != "tpu"
    p_pad = posf.shape[1]
    total = QueryResult(jnp.zeros((n, 3)), jnp.zeros((n,)),
                        jnp.zeros((n, 3)), jnp.zeros((n,)))
    for lo in range(0, p_pad, slab):
        hi = min(lo + slab, p_pad)

        def run(lo=lo, hi=hi):
            return _call_query(
                points, r * r, cap * cap, posf[:, lo:hi], payload[:, lo:hi],
                cull[:, lo // chunk:hi // chunk],
                n_chunks=(hi - lo) // chunk, chunk=chunk,
                interpret=interpret)

        def skip():
            return QueryResult(jnp.zeros((n, 3)), jnp.zeros((n,)),
                               jnp.zeros((n, 3)), jnp.zeros((n,)))

        # valid-first order: a slab that starts past the last valid photon
        # contributes nothing — skip its kernel entirely
        part = jax.lax.cond(jnp.int32(lo) < n_valid, run, skip)
        total = QueryResult(*(a + b for a, b in zip(total, part)))
    return total
