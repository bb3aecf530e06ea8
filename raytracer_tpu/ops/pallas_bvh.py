"""Pallas TPU kernel: leaf-culled sphere traversal (the in-kernel
acceleration structure).

The reference accelerates ray casts with a recursive binary BVH whose
traversal shrinks ``t_max`` as hits are found (bvh.rs:87-101). A per-ray
pointer-chasing descent is hostile to a lockstep vector machine, so the
TPU-native replacement flattens the hierarchy to exactly two levels and
makes every step dense vector work:

- **Host build** (:func:`build_leaf_tables`): spheres much larger than the
  median (e.g. scene_500's ground sphere) go to a small always-tested dense
  table; the rest are recursively median-split on the largest-extent axis
  into L spatial leaves of LEAF spheres with tight AABBs.
- **Kernel walk**: per ray, slab-test ALL leaf AABBs at once — a (TILE, L)
  vector op — then iterate: each live lane rank-selects its next K hit
  leaves (a cumulative-sum matmul on the MXU gives every lane the rank of
  every leaf; equality against the rank window yields exact one-hot rows),
  gathers those leaves' sphere records with block-diagonal one-hot matmuls
  (``kron(I_K, leaf_geo)``), and runs the quadratic sphere test on the
  gathered (TILE, K*LEAF) candidate block. The running best t dynamically
  culls leaves whose slab entry lies behind it (the ``t_max``-shrink
  semantics of bvh.rs:97), and lanes the wavefront has already retired
  contribute no leaves, so mostly-dead bounce tiles finish in one skipped
  iteration (``lax.cond``).

Versus the brute-force kernel (ops/pallas_intersect.py) this tests ~5-20x
fewer ray/sphere pairs on scene_500-class wavefronts (measured in
experiments/leaf_stats.py); the winner's material features are extracted
with one final one-hot matmul so shading still needs no table gathers.

MEASURED OUTCOME (ROUND_NOTES round 2, experiments/leaf_scaling_bench.py):
the candidate reduction does NOT translate into wall-clock wins on this
hardware — the dense kernel runs at ~85% of VPU single-issue peak and the
walk's per-iteration selection cost grows with the leaf count, so the
dense kernel is faster at every measured scene size (40 vs 58 ms at 1k
spheres, 405 vs 2214 ms at 16k, per 960k-ray cast). This kernel is kept as
an explicit ``--intersector leaf`` option and as the measured record of
why per-ray acceleration-structure walks lose to dense VMEM-resident scans
on a lockstep vector machine; auto dispatch never selects it. Its
whole-tile alive skip and the alive plumbing it introduced benefit all
kernels.

Rects and triangles reuse the dense stages (their counts are small in every
driver scene); the XLA flat-BVH path (ops/bvh.py) remains the fallback for
huge triangle meshes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.ops.intersect import Hit
from raytracer_tpu.ops.pallas_intersect import (
    BIG, CHUNK, N_FEAT, N_GEO_SLOTS, N_SLOTS, RayVals, SPH_CHUNK,
    SPH_RSQ_ROW, SPH_VEL_ROW, SPH_VEL_SLOTS, SPHERE_SLOTS, SUPER, TILE,
    _feature_rows, attrs_from_winner_data, eff_chunk, pack_rect_tri,
)
from raytracer_tpu.scene.types import (
    PRIM_RECT, PRIM_SPHERE, PRIM_TRIANGLE, LeafTables, Scene,
)

LEAF_SIZE = 32   # spheres per leaf; K_SLOTS * LEAF_SIZE = the 128-lane window
K_SLOTS = 4      # leaves gathered per ray per iteration
BIG_CHUNK = 128  # dense big-sphere chunk width
L_ALIGN = 32     # leaf-count padding multiple (keeps K*L lane-aligned)


# --------------------------------------------------------------------------
# FROZEN round-3 COLUMN-layout helpers. The dense kernel
# (ops/pallas_intersect.py) moved to rays-on-the-lane-axis in round 4; the
# leaf kernel below is an explicitly rejected-but-kept alternative (see the
# module docstring), so it keeps the measured round-3 layout verbatim:
# rays on sublanes ((TILE,1) per-ray columns), tables as (rows, prims)
# component planes, winner data as (TILE, N_SLOTS). Its _run() transposes
# pack_rect_tri's (prims, rows) tables back and emits (N_SLOTS, N) winner
# data at the boundary so every downstream consumer sees the one layout.
# --------------------------------------------------------------------------


def _fold_c(carry, t, ok, base, code, plane_block, plane_slots, computed):
    """Fold one chunk's t-matrix into the running best, extracting the
    winner's geometry + material features.

    ``plane_block`` is an (R, C) slice of the table; its winner values land
    in ``plane_slots`` via ONE onehot @ block^T matmul on the MXU (replacing
    R separate VPU reductions). ``computed`` maps slot -> per-pair (T, C)
    arrays (triangle barycentrics) reduced on the VPU. Pure: carry is
    (best_t, best_ty, best_ix, best_data-(T,N_SLOTS))."""
    best_t, best_ty, best_ix, best_data = carry
    tt = jnp.where(ok, t, BIG)
    m = jnp.min(tt, axis=1, keepdims=True)                  # (T,1)
    col = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 1).astype(jnp.float32)
    midx = jnp.min(jnp.where(tt <= m, col, BIG), axis=1, keepdims=True)
    better = m < best_t
    onehot = (col == midx).astype(jnp.float32)              # (T,C)
    # precision=HIGHEST: on TPU, f32 matmuls default to bf16 passes, which
    # would round the extracted winner geometry (e.g. 555 -> 556) and skew
    # normals/UVs — same guard as every geometry matmul in ops/intersect.py.
    vals = jax.lax.dot_general(                             # (T,R) MXU
        onehot, plane_block,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    cols = [None] * N_SLOTS
    for r, slot in enumerate(plane_slots):
        cols[slot] = vals[:, r:r + 1]
    for slot, arr in computed:
        cols[slot] = jnp.sum(onehot * arr, axis=1, keepdims=True)
    assembled = jnp.concatenate(
        [c if c is not None else jnp.zeros_like(m) for c in cols], axis=1)
    best_data = jnp.where(better, assembled, best_data)
    best_t = jnp.where(better, m, best_t)
    best_ty = jnp.where(better, float(code), best_ty)
    best_ix = jnp.where(better, midx + base, best_ix)
    return best_t, best_ty, best_ix, best_data


def ray_vals_c(o_ref, d_ref, tmin_ref, tmax_ref, time_ref=None) -> RayVals:
    ox, oy, oz = o_ref[:, 0:1], o_ref[:, 1:2], o_ref[:, 2:3]   # (T,1)
    dx, dy, dz = d_ref[:, 0:1], d_ref[:, 1:2], d_ref[:, 2:3]
    a = dx * dx + dy * dy + dz * dz                             # (T,1)
    big_inv = 1e30
    return RayVals(
        ox, oy, oz, dx, dy, dz, tmin_ref[:], tmax_ref[:],
        a, 1.0 / a,
        ox * dx + oy * dy + oz * dz,
        ox * ox + oy * oy + oz * oz,
        jnp.where(jnp.abs(dx) > 1e-30, 1.0 / dx, big_inv),
        jnp.where(jnp.abs(dy) > 1e-30, 1.0 / dy, big_inv),
        jnp.where(jnp.abs(dz) > 1e-30, 1.0 / dz, big_inv),
        time_ref[:] if time_ref is not None else None)


def init_carry_c(rv: RayVals):
    best_t = jnp.minimum(rv.tmax, BIG)
    return (best_t, jnp.full_like(best_t, -1.0),
            jnp.full_like(best_t, -1.0),
            jnp.zeros((best_t.shape[0], N_SLOTS), jnp.float32))


def _tile_slab_any_c(rv: RayVals, box_ref, jc, best_t):
    """Whole-ray-tile slab test vs one table AABB column: True if ANY lane's
    [tmin, min(best_t, tmax)] segment can touch box jc. Delegates to the
    explicit-operand form (one copy of the enter/leave math)."""
    return _tile_slab_any_vals_c(rv, box_ref[0, jc], box_ref[1, jc],
                               box_ref[2, jc], box_ref[3, jc],
                               box_ref[4, jc], box_ref[5, jc], best_t)


def _sphere_chunk_fold_c(c, rv: RayVals, blk, base):
    """One sphere chunk's quadratic tests + fold. ``blk`` is the loaded
    (rows, C) table slice; ``base`` the chunk's first column (python float
    for the static walk, traced f32 scalar for the ordered walk).

    NOTE: moving these dot products onto the MXU ((T,3)@(3,C) at HIGHEST)
    was measured SLOWER (65 vs 42-47 ms per 960k cast) — the K=3 matmul +
    operand relayouts cost more than the 10 VPU broadcast passes they
    replace. Kept on the VPU."""
    cx = blk[0:1, :]                                            # (1,C)
    cy = blk[1:2, :]
    cz = blk[2:3, :]
    rsq = blk[SPH_RSQ_ROW:SPH_RSQ_ROW + 1, :]
    # motion blur: c(t) = c + v * t_ray (centers become (T,C)); the
    # velocity rows exist only in motion-scene tables (static shape test)
    has_vel = rv.time is not None and blk.shape[0] > SPH_VEL_ROW
    if has_vel:
        cx = cx + blk[SPH_VEL_ROW:SPH_VEL_ROW + 1, :] * rv.time
        cy = cy + blk[SPH_VEL_ROW + 1:SPH_VEL_ROW + 2, :] * rv.time
        cz = cz + blk[SPH_VEL_ROW + 2:SPH_VEL_ROW + 3, :] * rv.time
    # direct oc = o - c quadratic (sphere.rs:24-31 / intersect.py):
    # the expanded |o|^2 - 2 o.c + csq form cancels catastrophically
    # at |o| ~ 1e3 (flipped a grazing hit to a miss on the 64k
    # field, disc = -2.6e-4); the extra 3 subs are ~10% of the body
    ocx = rv.ox - cx
    ocy = rv.oy - cy
    ocz = rv.oz - cz
    half_b = rv.dx * ocx + rv.dy * ocy + rv.dz * ocz
    c_term = ocx * ocx + ocy * ocy + ocz * ocz - rsq
    disc = half_b * half_b - rv.a * c_term
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    r1 = (-half_b - sq) * rv.inv_a
    r2 = (-half_b + sq) * rv.inv_a
    ok1 = (r1 >= rv.tmin) & (r1 <= rv.tmax)
    ok2 = (r2 >= rv.tmin) & (r2 <= rv.tmax)
    t = jnp.where(ok1, r1, jnp.where(ok2, r2, BIG))
    # motion tables extract the winner's velocity into slots 4..6 (rows
    # 18..20 follow the 18 static rows in plane order)
    slots = SPHERE_SLOTS + (SPH_VEL_SLOTS if has_vel else [])
    return _fold_c(c, t, (disc >= 0.0), base, PRIM_SPHERE,
                 blk, slots, [])


def sphere_stage_c(carry, rv: RayVals, sph_ref, cull_ref, n_sph: int,
                 chunk: int = None, scull_ref=None):
    """Dense chunk-culled sphere tests (sphere.rs:24-55 math).

    Two-level cull for big tables: chunks are Morton-compact and ordered
    near-to-far from the camera (pack side), grouped into SUPER-chunk
    AABBs (``scull_ref``); a ray tile slab-tests the superchunk first and
    skips its 8 chunks wholesale. With each lane's running best_t bounding
    ``leave``, the near-to-far order makes the scan effectively early-exit
    after the first hits land (the dense kernel's answer to bvh.rs:60-101
    for 64k+ primitive scenes)."""
    if chunk is None:
        chunk = eff_chunk(n_sph, SPH_CHUNK)
    n_ch = -(-n_sph // chunk)

    def run_chunk(c, j):
        any_hit = _tile_slab_any_c(rv, cull_ref, j // chunk, c[0])

        def chunk_body(c, j=j):
            return _sphere_chunk_fold_c(c, rv, sph_ref[:, j:j + chunk],
                                      float(j))

        return jax.lax.cond(any_hit, chunk_body, lambda c: c, c)

    # two-level culling needs a whole number of SUPER groups; tables the
    # packer left un-grouped (plain Morton layout) flat-scan their chunks
    if scull_ref is None or n_ch <= SUPER or n_ch % SUPER != 0:
        for j in range(0, n_sph, chunk):
            carry = run_chunk(carry, j)
        return carry

    # two-level: superchunk slab test gates its SUPER member chunks
    for s_i in range(n_ch // SUPER):
        any_super = _tile_slab_any_c(rv, scull_ref, s_i, carry[0])

        def super_body(c, s_i=s_i):
            for m in range(SUPER):
                c = run_chunk(c, (s_i * SUPER + m) * chunk)
            return c

        carry = jax.lax.cond(any_super, super_body, lambda c: c, carry)
    return carry


def _tile_slab_any_vals_c(rv: RayVals, lox, loy, loz, hix, hiy, hiz, best_t):
    """_tile_slab_any_c against explicit AABB scalars (ordered walk reads
    them from SMEM; the static walk reads VMEM rows at static indices)."""
    t0x = (lox - rv.ox) * rv.inv_dx
    t1x = (hix - rv.ox) * rv.inv_dx
    t0y = (loy - rv.oy) * rv.inv_dy
    t1y = (hiy - rv.oy) * rv.inv_dy
    t0z = (loz - rv.oz) * rv.inv_dz
    t1z = (hiz - rv.oz) * rv.inv_dz
    enter = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                    jnp.minimum(t0y, t1y)),
                        jnp.maximum(jnp.minimum(t0z, t1z), rv.tmin))
    leave = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                    jnp.maximum(t0y, t1y)),
                        jnp.minimum(jnp.maximum(t0z, t1z),
                                    jnp.minimum(best_t, rv.tmax)))
    return jnp.any(enter <= leave)


def rect_stage_c(carry, rv: RayVals, rect_ref, n_rect: int):
    """Axis-rect plane tests (rectangle.rs semantics)."""
    chunk = eff_chunk(n_rect, CHUNK)
    for j in range(0, n_rect, chunk):
        planes = [rect_ref[r:r + 1, j:j + chunk] for r in range(14 + N_FEAT)]
        (nx, ny, nz, ax_, ay, az, bx, by, bz, k, a0, a1, b0, b1) = planes[:14]
        d_n = rv.dx * nx + rv.dy * ny + rv.dz * nz
        o_n = rv.ox * nx + rv.oy * ny + rv.oz * nz
        safe = jnp.abs(d_n) > 1e-12
        t = (k - o_n) / jnp.where(safe, d_n, 1.0)
        pa = ((rv.ox * ax_ + rv.oy * ay + rv.oz * az)
              + t * (rv.dx * ax_ + rv.dy * ay + rv.dz * az))
        pb = ((rv.ox * bx + rv.oy * by + rv.oz * bz)
              + t * (rv.dx * bx + rv.dy * by + rv.dz * bz))
        ok = (safe & (pa >= a0) & (pa <= a1) & (pb >= b0) & (pb <= b1)
              & (t >= rv.tmin) & (t <= rv.tmax))
        carry = _fold_c(carry, t, ok, float(j), PRIM_RECT,
                      rect_ref[:, j:j + chunk],
                      list(range(14)) + list(range(N_GEO_SLOTS, N_SLOTS)), [])
    return carry


def _tri_oxd_c(rv: RayVals):
    """o x d cross-product columns shared by every tri chunk body."""
    return (rv.oy * rv.dz - rv.oz * rv.dy,
            rv.oz * rv.dx - rv.ox * rv.dz,
            rv.ox * rv.dy - rv.oy * rv.dx)


def _tri_chunk_fold_c(c, rv: RayVals, oxd, blk, base):
    """One tri chunk's scalar-triple-product Möller–Trumbore tests + fold
    (mesh.rs:57-98 semantics). ``blk`` is the loaded (rows, C) table slice;
    ``base`` the chunk's first column (python float for the static walk,
    traced f32 scalar for the ordered walk)."""
    oxd_x, oxd_y, oxd_z = oxd
    ox, oy, oz, dx, dy, dz = rv.ox, rv.oy, rv.oz, rv.dx, rv.dy, rv.dz
    pr = [blk[r:r + 1, :] for r in range(16)]
    (ngx, ngy, ngz, e1x, e1y, e1z, e2x, e2y, e2z,
     w2x, w2y, w2z, w1x, w1y, w1z, v0n) = pr
    div = -(dx * ngx + dy * ngy + dz * ngz)
    safe = div != 0.0
    inv = 1.0 / jnp.where(safe, div, 1.0)
    b1 = ((oxd_x * e2x + oxd_y * e2y + oxd_z * e2z)
          - (dx * w2x + dy * w2y + dz * w2z)) * inv
    b2 = (-(oxd_x * e1x + oxd_y * e1y + oxd_z * e1z)
          + (dx * w1x + dy * w1y + dz * w1z)) * inv
    t = ((ox * ngx + oy * ngy + oz * ngz) - v0n) * inv
    ok = (safe & (b1 >= 0.0) & (b1 <= 1.0) & (b2 >= 0.0)
          & (b1 + b2 <= 1.0) & (t >= rv.tmin) & (t <= rv.tmax))
    # winner slots: [b1, b2, n0 xyz, n1 xyz, n2 xyz | feats | orig];
    # the barycentrics are per-pair computed -> VPU reductions
    return _fold_c(c, t, ok, base, PRIM_TRIANGLE, blk[16:, :],
                 list(range(2, 11))
                 + list(range(N_GEO_SLOTS, N_SLOTS)) + [14],
                 [(0, b1), (1, b2)])


def tri_stage_c(carry, rv: RayVals, tri_ref, tcull_ref, n_tri: int):
    """Chunk-culled Möller–Trumbore (mesh.rs:57-98 semantics). Triangles
    are Morton-ordered with per-chunk AABBs (tcull_ref), so mesh chunks a
    ray's slab misses are cond-skipped like the sphere chunks."""
    oxd = _tri_oxd_c(rv)
    chunk = eff_chunk(n_tri, CHUNK)
    for j in range(0, n_tri, chunk):
        any_hit = _tile_slab_any_c(rv, tcull_ref, j // chunk, carry[0])

        def chunk_body(c, j=j):
            return _tri_chunk_fold_c(c, rv, oxd, tri_ref[:, j:j + chunk],
                                   float(j))

        carry = jax.lax.cond(any_hit, chunk_body, lambda c: c, carry)
    return carry


def finish_carry_c(carry, t_out, ty_out, ix_out, data_out):
    """Write the folded winner to the output refs (shared epilogue)."""
    best_t, best_ty, best_ix, best_data = carry
    miss = best_ty < 0.0
    # spheres and triangles are Morton-reordered; slot 14 carries the
    # original index for both
    best_ix = jnp.where((best_ty == float(PRIM_SPHERE))
                        | (best_ty == float(PRIM_TRIANGLE)),
                        best_data[:, 14:15], best_ix)
    t_out[:] = jnp.where(miss, BIG, best_t)  # mapped to +inf by the wrapper
    ty_out[:] = best_ty.astype(jnp.int32)
    ix_out[:] = best_ix.astype(jnp.int32)
    data_out[:] = best_data



# ----------------------------------------------------------- host-side build

def _partition_leaves(centers: np.ndarray, leaf: int):
    """Recursive median split on the largest-extent axis; split points are
    leaf-size multiples so every leaf but one is full. Returns index lists."""
    out = []

    def split(idx):
        if len(idx) <= leaf:
            out.append(idx)
            return
        c = centers[idx]
        ax = int(np.argmax(c.max(0) - c.min(0)))
        order = np.argsort(c[:, ax], kind="stable")
        h = len(idx) // 2
        h = max(leaf, min(len(idx) - leaf, -(-h // leaf) * leaf))
        split(idx[order[:h]])
        split(idx[order[h:]])

    split(np.arange(centers.shape[0]))
    return out


def build_leaf_tables(scene: Scene, leaf_size: int = LEAF_SIZE,
                      k_slots: int = K_SLOTS,
                      big_factor: float = 20.0) -> LeafTables:
    """Build the LeafTables pytree (host, numpy — run once per scene,
    outside jit; shapes are static)."""
    s = scene.spheres
    centers = np.asarray(s.center, np.float64)
    radii = np.abs(np.asarray(s.radius, np.float64))
    mat_id = np.asarray(s.mat_id)
    n = radii.shape[0]
    if n == 0:
        raise ValueError("leaf tables need at least one sphere")

    big = radii > big_factor * max(np.median(radii), 1e-12)
    small_ix = np.where(~big)[0]
    big_ix = np.where(big)[0]

    feats_all = np.asarray(_feature_rows(scene, jnp.asarray(mat_id)),
                           np.float32)                      # (12, n)

    def planes(ix):
        """17-row component planes [cx cy cz csq | feats | orig idx]."""
        c = centers[ix].T
        csq = (c * c).sum(0) - radii[ix] ** 2
        return np.concatenate([
            c, csq[None], feats_all[:, ix], ix[None].astype(np.float64),
        ], 0).astype(np.float32)

    # ---- dense big-sphere table (chunked like the brute-force kernel);
    # row 17 = r^2 for sphere_stage's direct-form quadratic (see
    # pallas_intersect.SPH_RSQ_ROW)
    nb = len(big_ix)
    b_pad = max(BIG_CHUNK, -(-nb // BIG_CHUNK) * BIG_CHUNK)
    big_tab = np.zeros((18, b_pad), np.float32)
    big_tab[3, :] = 3e38                                    # pad: disc < 0
    big_tab[17, :] = -3e38                                  # pad: c_term > 0
    if nb:
        big_tab[:17, :nb] = planes(big_ix)
        big_tab[17, :nb] = (radii[big_ix] ** 2).astype(np.float32)
    n_chunks = b_pad // BIG_CHUNK
    big_cull = np.zeros((6, n_chunks), np.float32)
    big_cull[:3] = 3e38
    big_cull[3:] = -3e38                                    # inverted: skip
    for j in range(n_chunks):
        ix = big_ix[j * BIG_CHUNK:(j + 1) * BIG_CHUNK]
        if len(ix):
            big_cull[:3, j] = (centers[ix] - radii[ix, None]).min(0)
            big_cull[3:, j] = (centers[ix] + radii[ix, None]).max(0)

    # ---- leaves over the small spheres
    leaves = _partition_leaves(centers[small_ix], leaf_size)
    n_leaf = len(leaves)
    l_pad = max(L_ALIGN, -(-n_leaf // L_ALIGN) * L_ALIGN)

    aabb = np.zeros((6, l_pad), np.float32)
    aabb[:3] = 3e38                                         # empty: never hit
    aabb[3:] = -3e38
    table = np.zeros((17, l_pad * leaf_size), np.float32)
    table[3, :] = 3e38                                      # pad: disc < 0
    geo = np.zeros((5, l_pad, leaf_size), np.float32)       # cx cy cz csq id+1
    geo[3] = 3e38
    for li, rel in enumerate(leaves):
        ix = small_ix[rel]
        aabb[:3, li] = (centers[ix] - radii[ix, None]).min(0)
        aabb[3:, li] = (centers[ix] + radii[ix, None]).max(0)
        cols = li * leaf_size + np.arange(len(ix))
        table[:, cols] = planes(ix)
        geo[:4, li, :len(ix)] = table[:4, cols]
        geo[4, li, :len(ix)] = cols + 1.0                   # 0 = empty slot

    kron = np.stack([np.kron(np.eye(k_slots, dtype=np.float32), geo[c])
                     for c in range(5)], 0)                 # (5, K*L, K*LEAF)
    # two-term bf16 split: hi + mid sums back to 16 mantissa bits of the
    # f32 value — one MXU pass per term instead of HIGHEST's six
    import jax.numpy as _jnp
    hi = np.asarray(_jnp.asarray(kron, _jnp.bfloat16))
    mid = np.asarray(_jnp.asarray(
        kron - np.asarray(hi, np.float32), _jnp.bfloat16))
    kron2 = np.stack([hi, mid], 0)                          # (2, 5, KL, KLEAF)
    return LeafTables(
        aabb=jnp.asarray(aabb), kron=jnp.asarray(kron2, jnp.bfloat16),
        table=jnp.asarray(table), big=jnp.asarray(big_tab),
        big_cull=jnp.asarray(big_cull))


def with_leaf_tables(scene: Scene, min_spheres: int = 256,
                     leaf_size: int = LEAF_SIZE) -> Scene:
    """Attach leaf tables when the scene profits from them (many spheres, no
    motion blur). No-op otherwise, and never rebuilds existing tables."""
    if scene.leaf is not None:
        return scene
    if scene.spheres.motion_marker.shape[0]:
        return scene
    if scene.spheres.radius.shape[0] < min_spheres:
        return scene
    return scene._replace(leaf=build_leaf_tables(scene, leaf_size=leaf_size))


# ------------------------------------------------------------------- kernel

def _leaf_kernel(o_ref, d_ref, tmin_ref, tmax_ref, alive_ref,
                 big_ref, bigcull_ref, rect_ref, tri_ref, tcull_ref,
                 aabb_ref, kron_ref, table_ref,
                 t_out, ty_out, ix_out, data_out,
                 *, n_big: int, n_rect: int, n_tri: int,
                 n_leaf: int, leaf: int, k_slots: int):
    rv = ray_vals_c(o_ref, d_ref, tmin_ref, tmax_ref)
    # whole-tile skip for fully-retired tiles: a value-returning cond keeps
    # the output writes unconditional (conditional ref stores stall the
    # Mosaic output pipeline)
    any_alive = jnp.any(alive_ref[:] > 0.5)

    def dense(carry):
        # dense stages first: their hits (e.g. the ground sphere) bound t
        # and cull leaves in the walk below
        carry = sphere_stage_c(carry, rv, big_ref, bigcull_ref, n_big,
                               chunk=BIG_CHUNK)
        carry = rect_stage_c(carry, rv, rect_ref, n_rect)
        carry = tri_stage_c(carry, rv, tri_ref, tcull_ref, n_tri)
        return carry

    carry = jax.lax.cond(any_alive, dense, lambda c: c, init_carry_c(rv))
    best_t, best_ty, best_ix, best_data = carry

    n = best_t.shape[0]
    kl = k_slots * n_leaf
    kw = k_slots * leaf

    # slab-test every leaf at once: (TILE, L)
    t0x = (aabb_ref[0:1, :] - rv.ox) * rv.inv_dx
    t1x = (aabb_ref[3:4, :] - rv.ox) * rv.inv_dx
    t0y = (aabb_ref[1:2, :] - rv.oy) * rv.inv_dy
    t1y = (aabb_ref[4:5, :] - rv.oy) * rv.inv_dy
    t0z = (aabb_ref[2:3, :] - rv.oz) * rv.inv_dz
    t1z = (aabb_ref[5:6, :] - rv.oz) * rv.inv_dz
    enter = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                    jnp.minimum(t0y, t1y)),
                        jnp.maximum(jnp.minimum(t0z, t1z), rv.tmin))
    leave = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                    jnp.maximum(t0y, t1y)),
                        jnp.minimum(jnp.maximum(t0z, t1z), rv.tmax))
    alive = alive_ref[:] > 0.5
    maskb = (enter <= leave) & alive
    entry = jnp.where(maskb, enter, BIG)
    # the iteration state rides lax.cond; Mosaic cannot yield i1 vectors
    # from scf.if, so the mask travels as f32 0/1
    mask0 = maskb.astype(jnp.float32)

    # rank machinery: cs = mask @ lower-tri gives each leaf's 1-based rank
    # among the lane's active leaves (exact: small ints, f32 accumulate)
    rl = jax.lax.broadcasted_iota(jnp.int32, (n_leaf, n_leaf), 0)
    cl = jax.lax.broadcasted_iota(jnp.int32, (n_leaf, n_leaf), 1)
    ltm = (rl <= cl).astype(jnp.float32)
    rank_tgt = (jax.lax.broadcasted_iota(jnp.int32, (n, kl), 1)
                // n_leaf + 1).astype(jnp.float32)

    def cull(st):
        m, lt, lc = st
        return (jnp.where(entry < lt, m, 0.0), lt, lc)

    def it_body(st):
        maskf, lt, lcol = st
        cs = jax.lax.dot_general(maskf, ltm, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        cs_t = jnp.concatenate([cs] * k_slots, axis=1)          # (T, K*L)
        mask_t = jnp.concatenate([maskf] * k_slots, axis=1)
        sel = jnp.where(cs_t == rank_tgt, mask_t, 0.0).astype(jnp.bfloat16)
        # block-diagonal one-hot gathers, one bf16 MXU pass per split term
        # (16-bit candidate precision; the winner is re-derived exactly from
        # the f32 table below)
        g = [jax.lax.dot_general(sel, kron_ref[term, c],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
             for term in range(2) for c in range(5)]
        cx, cy, cz, csq, gid = [g[c] + g[5 + c] for c in range(5)]
        half_b = rv.o_dot_d - (rv.dx * cx + rv.dy * cy + rv.dz * cz)
        c_term = rv.o_sq - 2.0 * (rv.ox * cx + rv.oy * cy + rv.oz * cz) + csq
        disc = half_b * half_b - rv.a * c_term
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        r1 = (-half_b - sq) * rv.inv_a
        r2 = (-half_b + sq) * rv.inv_a
        ok1 = (r1 >= rv.tmin) & (r1 <= rv.tmax)
        ok2 = (r2 >= rv.tmin) & (r2 <= rv.tmax)
        tt = jnp.where(ok1, r1, jnp.where(ok2, r2, BIG))
        tt = jnp.where((disc >= 0.0) & (gid > 0.5), tt, BIG)
        m = jnp.min(tt, axis=1, keepdims=True)
        wcol = jnp.min(jnp.where(tt <= m, gid, BIG), axis=1, keepdims=True)
        better = m < lt
        lt = jnp.where(better, m, lt)
        lcol = jnp.where(better, wcol, lcol)
        return (jnp.where(cs > float(k_slots), maskf, 0.0), lt, lcol)

    state = (mask0, best_t, jnp.zeros_like(best_t))
    for _ in range(-(-n_leaf // k_slots)):
        state = cull(state)
        state = jax.lax.cond(jnp.any(state[0] > 0.0), it_body,
                             lambda s: s, state)
    _, lt, lcol = state

    # extract the leaf winner's full record with one one-hot matmul
    leaf_won = lcol > 0.5
    colf = jax.lax.broadcasted_iota(
        jnp.int32, (n, n_leaf * leaf), 1).astype(jnp.float32)
    onehot = jnp.where(colf == lcol - 1.0, 1.0, 0.0)
    win = jax.lax.dot_general(onehot, table_ref[:, :],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)  # (T, 17)
    # re-derive the winner's t from its exact f32 record (the candidate pass
    # ran at 16-bit gather precision) with the FULL nearest-root-in-range
    # rule. If the exact test rejects the rounded candidate (disc < 0 or
    # both roots out of range — grazing rays near the bf16 threshold), the
    # lane takes the rescue scan below instead of reporting a phantom hit.
    wcx, wcy, wcz, wcsq = win[:, 0:1], win[:, 1:2], win[:, 2:3], win[:, 3:4]
    hb = rv.o_dot_d - (rv.dx * wcx + rv.dy * wcy + rv.dz * wcz)
    ct = rv.o_sq - 2.0 * (rv.ox * wcx + rv.oy * wcy + rv.oz * wcz) + wcsq
    disc = hb * hb - rv.a * ct
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    r1 = (-hb - sq) * rv.inv_a
    r2 = (-hb + sq) * rv.inv_a
    ok1 = (r1 >= rv.tmin) & (r1 <= rv.tmax)
    ok2 = (r2 >= rv.tmin) & (r2 <= rv.tmax)
    t_exact = jnp.where(ok1, r1, jnp.where(ok2, r2, BIG))
    reject = leaf_won & ~((disc >= 0.0) & (t_exact < BIG))
    leaf_won = leaf_won & (disc >= 0.0) & (t_exact < BIG)
    lt = jnp.where(leaf_won, t_exact, lt)

    # Rescue pass (ADVICE r2 phantom-miss edge): a rejected bf16 winner may
    # have shadowed a genuine hit — in the same leaf, another leaf, or a
    # leaf the walk culled against the phantom t. Re-scan the FULL
    # small-sphere f32 table with the exact recheck math (bounded by the
    # dense-stage best, strict < like the candidate fold) and extract that
    # winner's record. Runs only when the tile actually has a rejection.
    def rescue(args):
        fl_t, fl_col, _ = args
        kw_all = table_ref.shape[1]                       # L_ALIGN*32-mult
        for j in range(0, kw_all, 1024):
            w_j = min(1024, kw_all - j)
            blk = table_ref[:, j:j + w_j]
            bcx, bcy, bcz = blk[0:1], blk[1:2], blk[2:3]
            bcsq = blk[3:4]
            bhb = rv.o_dot_d - (rv.dx * bcx + rv.dy * bcy + rv.dz * bcz)
            bct = (rv.o_sq - 2.0 * (rv.ox * bcx + rv.oy * bcy + rv.oz * bcz)
                   + bcsq)
            bdd = bhb * bhb - rv.a * bct
            bsq = jnp.sqrt(jnp.maximum(bdd, 0.0))
            q1 = (-bhb - bsq) * rv.inv_a
            q2 = (-bhb + bsq) * rv.inv_a
            o1 = (q1 >= rv.tmin) & (q1 <= rv.tmax)
            o2 = (q2 >= rv.tmin) & (q2 <= rv.tmax)
            tt = jnp.where(o1, q1, jnp.where(o2, q2, BIG))
            tt = jnp.where(bdd >= 0.0, tt, BIG)
            m = jnp.min(tt, axis=1, keepdims=True)
            cc = jax.lax.broadcasted_iota(
                jnp.int32, tt.shape, 1).astype(jnp.float32)
            mc = jnp.min(jnp.where(tt <= m, cc, BIG), axis=1,
                         keepdims=True) + float(j)
            better = m < fl_t
            fl_t = jnp.where(better, m, fl_t)
            fl_col = jnp.where(better, mc, fl_col)
        oh2 = jnp.where(colf == fl_col, 1.0, 0.0)
        win2 = jax.lax.dot_general(oh2, table_ref[:, :],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
        return fl_t, fl_col, win2

    fl0 = (best_t, jnp.full_like(best_t, -1.0), jnp.zeros_like(win))
    fl_t, fl_col, win2 = jax.lax.cond(jnp.any(reject), rescue,
                                      lambda a: a, fl0)
    rescued = reject & (fl_col >= 0.0)
    leaf_won = leaf_won | rescued
    lt = jnp.where(rescued, fl_t, lt)
    lcol = jnp.where(rescued, fl_col + 1.0, lcol)
    win = jnp.where(rescued, win2, win)

    leaf_data = jnp.concatenate([
        win[:, 0:4],                                  # slots 0-3: geometry
        jnp.zeros((n, 10), jnp.float32),              # slots 4-13
        win[:, 16:17],                                # slot 14: original idx
        jnp.zeros((n, 1), jnp.float32),               # slot 15
        win[:, 4:16],                                 # slots 16-27: features
    ], axis=1)
    best_data = jnp.where(leaf_won, leaf_data, best_data)
    best_ty = jnp.where(leaf_won, float(PRIM_SPHERE), best_ty)
    best_ix = jnp.where(leaf_won, lcol - 1.0, best_ix)
    best_t = jnp.where(leaf_won, lt, best_t)
    finish_carry_c((best_t, best_ty, best_ix, best_data),
                   t_out, ty_out, ix_out, data_out)


@functools.partial(jax.jit, static_argnames=("n_big", "n_rect", "n_tri",
                                             "n_leaf", "leaf", "k_slots",
                                             "interpret"))
def _call_leaf_kernel(o, d, tmin, tmax, alive, big, bigcull, rect, tri,
                      tcull, aabb, kron, table, *,
                      n_big, n_rect, n_tri, n_leaf, leaf, k_slots, interpret):
    n = o.shape[0]
    n_pad = -(-n // TILE) * TILE
    pad = n_pad - n
    if pad:
        o = jnp.pad(o, [(0, pad), (0, 0)])
        d = jnp.pad(d, [(0, pad), (0, 0)])   # zero dir -> all tests miss
        tmin = jnp.pad(tmin, [(0, pad)])
        tmax = jnp.pad(tmax, [(0, pad)])
        alive = jnp.pad(alive, [(0, pad)])   # pad lanes are dead
    tmin = tmin[:, None]
    tmax = tmax[:, None]
    alive = alive.astype(jnp.float32)[:, None]

    grid = (n_pad // TILE,)
    kernel = functools.partial(_leaf_kernel, n_big=n_big, n_rect=n_rect,
                               n_tri=n_tri, n_leaf=n_leaf, leaf=leaf,
                               k_slots=k_slots)
    ray_spec = lambda w: pl.BlockSpec((TILE, w), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    t, ty, ix, data = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec(3), ray_spec(3), ray_spec(1), ray_spec(1),
                  ray_spec(1)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=[ray_spec(1), ray_spec(1), ray_spec(1), ray_spec(N_SLOTS)],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, N_SLOTS), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n_pad * (40 * (n_big + k_slots * leaf * 3)
                           + 60 * n_rect + 80 * n_tri + 14 * n_leaf),
            bytes_accessed=n_pad * 150,
            transcendentals=n_pad * (n_big + k_slots * leaf)),
        interpret=interpret,
    )(o, d, tmin, tmax, alive, big, bigcull, rect, tri, tcull, aabb, kron,
      table)
    t = t[:n, 0]
    # boundary: winner data leaves in the round-4 (N_SLOTS, N) row layout
    return (jnp.where(t >= BIG, jnp.inf, t), ty[:n, 0], ix[:n, 0], data[:n].T)


def _run(scene: Scene, o, d, t_min, t_max, alive=None):
    lt = scene.leaf
    if lt is None:
        raise ValueError("scene has no leaf tables; call with_leaf_tables")
    # pack_rect_tri emits the round-4 (prims, rows) layout; the frozen
    # column kernel wants (rows, prims) — transpose back (trace-time, tiny)
    rect, tri, tcull, _ = pack_rect_tri(scene)
    rect, tri = rect.T, tri.T
    n = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    tmax = jnp.broadcast_to(
        jnp.minimum(jnp.asarray(t_max, jnp.float32), BIG), (n,))
    if alive is None:
        alive = jnp.ones((n,), jnp.float32)
    n_leaf = lt.aabb.shape[1]
    leaf = lt.table.shape[1] // n_leaf
    k_slots = lt.kron.shape[3] // leaf
    interpret = jax.default_backend() != "tpu"
    # an all-pad big table keeps its inverted chunk AABBs, so its one chunk
    # is cond-skipped in-kernel at slab-test cost — no static flag needed
    return _call_leaf_kernel(
        o, d, tmin, tmax, alive, lt.big, lt.big_cull, rect, tri, tcull,
        lt.aabb, lt.kron, lt.table,
        n_big=lt.big.shape[1],
        n_rect=rect.shape[1] if scene.rects.k.shape[0] else 0,
        n_tri=tri.shape[1] if scene.triangles.mat_id.shape[0] else 0,
        n_leaf=n_leaf, leaf=leaf, k_slots=k_slots, interpret=interpret)


def intersect_leaf(scene: Scene, o, d, t_min, t_max, alive=None) -> Hit:
    """Closest hit via the leaf-traversal kernel."""
    t, ty, ix, _ = _run(scene, o, d, t_min, t_max, alive)
    return Hit(t, ty, ix)


def intersect_leaf_full(scene: Scene, o, d, t_min, t_max, alive=None):
    """One fused call: (Hit, HitAttrs, MatFeatures)."""
    t, ty, ix, data = _run(scene, o, d, t_min, t_max, alive)
    hit = Hit(t, ty, ix)
    attrs, feats = attrs_from_winner_data(o, d, hit, data)
    return hit, attrs, feats
