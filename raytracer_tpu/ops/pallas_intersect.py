"""Pallas TPU kernel: closest hit + winner attributes over all primitive
tables.

Why this kernel exists: the XLA brute-force path (ops/intersect.py)
materializes (N_rays, C) intermediates in HBM for every primitive chunk of
every bounce, and the follow-up HitRecord computation performs per-ray table
gathers — both HBM-bandwidth/scalar-unit bound. This kernel tiles rays
(TILE=256) over a 1-D grid, holds ALL primitive tables resident in VMEM
(scene_500 is ~20 KB of spheres), performs the whole (TILE, CHUNK)
intersection + reduction on-chip, AND extracts the winning primitive's
parameters with in-VMEM masked lane reductions — so the hit-attribute pass
downstream needs NO gathers at all.

Layout (round 4, RAYS ON THE LANE AXIS): tables are packed as
(prims, components) so a chunk's component is a (C,1) COLUMN (prims on
sublanes) broadcast against a (1,TILE) ray ROW (rays on lanes) into a
(C,TILE) pair matrix — pure VPU work; no (TILE,C,3) tensors anywhere.
Round 3 used the transpose ((TILE,1) ray columns vs (1,C) table rows);
per-ray scalar ops then ran at 1/128 VPU lane utilization (TILE/8 = 32
vregs per op), and the step profile (experiments/step_profile.py,
ROUND_NOTES round 4) showed ~9 ms/step of such fixed cost at 960k lanes —
more than the actual ray/primitive pair math at headline scale. With rays
on lanes a per-ray op is TILE/128 = 2 vregs (16x), pair-matrix cost is
unchanged, winner extraction stays one MXU matmul, and winner data
returns as (N_SLOTS, N) component rows (also the XLA-friendly layout for
the SoA shading stage downstream).

Every table carries 12 trailing MATERIAL FEATURE rows (mat kind, fuzz, ir,
tex kind, color0, color1, image_id, mat_id — material+texture data
denormalized per primitive at pack time), so the winner's material record is
extracted by the same in-VMEM reduction and the shading pass needs no table
access at all (TPU gathers are scalar-unit loops; with ~1000 deduped
materials in scene_500 they dominated the bounce).

- spheres  (4+12, S): cx, cy, cz, |c|^2 - r^2 | feats   (pad: row3 = +BIG)
- rects   (14+12, R): n/a/b one-hots, k, a0, a1, b0, b1 | feats
                                                        (pad: a0=1, a1=-1)
- tris    (25+12, T): n_geo, e1, e2, e2xv0, e1xv0, v0.n, n0, n1, n2 | feats
                                                        (pad: zeros -> div=0)

Winner-data slots (32, TILE), decoded in :func:`attrs_from_winner_data`:
- slots 0..15 geometry by type:
  sphere [cx, cy, cz, csq];  rect [planes 0..13];
  tri [b1, b2, n0 xyz, n1 xyz, n2 xyz]
- slots 16..27 material features (see FEAT_* indices)

Math matches ops/intersect.py exactly (sphere.rs:24-55, rectangle.rs,
mesh.rs:57-98 via the scalar-triple-product form). Falls back to interpret
mode off-TPU so tests exercise the same code path.

NOTE on the module tunables (SPH_CHUNK, SUPER, ORDER_MIN_CHUNKS,
REACH_CLAMP, ORDER_STATS): they are trace-time constants baked into the
jitted kernel programs on first use. Flipping one after a kernel has
traced is silently ignored by already-cached programs — A/B them with one
process per setting (the experiments/ harnesses do exactly that), or call
jax.clear_caches() after toggling.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.ops import vec
from raytracer_tpu.ops.intersect import Hit, HitAttrs, sphere_uv
from raytracer_tpu.scene.types import (
    INTER_ABSORB, INTER_DIFFUSE, INTER_REFLECT, INTER_REFRACT,
    INTER_SPECULAR, MAT_DIELECTRIC, MAT_DIFFUSE_LIGHT, MAT_LAMBERTIAN,
    MAT_METAL, PRIM_RECT, PRIM_SPHERE, PRIM_TRIANGLE, Scene, TEX_CHECKER,
)

# Rays per kernel instance. Round-3's column layout measured 256 > 512
# (cull granularity); the round-4 row layout + cheap per-chunk fixed costs
# flipped it, and wider kept winning on sphere scenes — v5e,
# tile_width_bench + tile_scene_sweep: scene_500 noRR 43.7 (256-era 42) ->
# 53.2 (512) -> 59.7 Mrays/s (1024); RR 54.1 -> 60.5; scene_10 RR 115.7 ->
# 127.4; motion1k 25.3 -> 26.7; field64k walk ties (6.06 vs 6.11 s). But
# TRIANGLE scenes want 256: the round-4 TILE-512 commit re-validated only
# the sphere walk; round 5's A/B (experiments/tri_tile_bench.py, v5e,
# bunny_field 124k tris, 800x600 8spp RR) measured 512 -> 10.72 s,
# 256 -> 6.23 s, 128 -> 7.15 s — at 512 the tri walk's per-tile alive-
# AABB spans 4 pixel blocks and walks ~2x the chunks, and (tri_chunk,
# TILE) pair matrices double. The tile width is chosen PER CALL by
# tile_for(): a pure function of the static table sizes (cache-key safe
# under jit).
TILE = 512       # the leaf/bvh kernel's tile
TILE_TRI = 256   # tri-walk scenes (real triangle table past one chunk)
TILE_SPH = 1024  # sphere/rect scenes (no tri table beyond one chunk)


def tile_for(n_tri: int) -> int:
    """Ray-tile width for a kernel call — 256 when a real triangle table
    is present (more than one chunk), else 1024. Pure in the static table
    sizes, so jit caches keyed on (n_sph, n_rect, n_tri) stay coherent."""
    return TILE_TRI if n_tri > CHUNK else TILE_SPH
CHUNK = 512        # rect/tri chunk width
# Sphere chunk width. Finer chunks enable more selective per-chunk AABB
# culling but add per-chunk fixed costs (reductions, extraction). Round 3's
# column layout measured 1024 > 512 > 128 (per-chunk reductions ran on
# (TILE,1) columns); the round-4 row layout made per-chunk fixed cost ~16x
# cheaper and flipped the tradeoff — measured on v5e (experiments/
# headline_chunk_bench.py + chunk_tuning_bench.py): scene_500 (1005 sph,
# 4-chunk flat scan with per-chunk best-t culls) 37.1 -> 40.0 Mrays/s noRR;
# 64k field (ordered walk) 6.53 -> 6.10 s per 32spp render, 512 ties 256.
SPH_CHUNK = 256
SUPER = 8          # sphere chunks per superchunk AABB (two-level cull)
# Sub-chunk cull granularity for FLAT-scan sphere tables: candidate tests
# gated per SPH_SUB-wide sub-block while the winner fold stays chunk-wide.
# MEASURED OFF (round 5, v5e, scene_500 noRR Mrays/s): sub=64 45.6, sub=32
# 38.9 vs 54.1 dense — the per-sub cond/slab machinery costs more than the
# ~460->260 pairs/ray it saves, the same per-gate fixed cost that rejected
# fine chunks (45.0) and the ordered walk (47-52) at this scale
# (experiments/headline_cull_stats.py + headline_chunk_bench.py,
# ROUND_NOTES round 5). Dense uninterrupted SIMD wins at 1k spheres; set
# SPH_SUB=64 to re-enable for A/B. When on, flat tables carry the
# (6, k*nsub) sub-AABB table in the otherwise-unused scull operand slot.
SPH_SUB = 0
SPH_SUB_MIN = 256  # enable sub-gating only for tables at least this big
N_GEO_SLOTS = 16
N_FEAT = 12
N_SLOTS = N_GEO_SLOTS + N_FEAT
SPH_RSQ_ROW = 5 + N_FEAT  # sphere table row 17: r^2 (direct-form test)
SPH_RSQ_SLOT = 15         # winner slot carrying r^2 (unused by rect/tri)
# Motion blur (extension; the reference Ray has no time, ray.rs:3-6):
# moving-sphere scenes pack 3 extra velocity rows (vx, vy, vz) and the
# kernel tests against c + v*t_ray. Static scenes pack no motion rows, so
# their compiled programs are unchanged. The winner's velocity is
# extracted into slots 4..6 (free for sphere winners) and _run folds it
# into the center slots, so every attrs consumer sees EFFECTIVE centers.
SPH_VEL_ROW = 6 + N_FEAT  # first velocity row (rows 18..20)
SPH_VEL_SLOTS = [4, 5, 6]
# Ordered dynamic chunk walk (large sphere tables): per-tile near-to-far
# chunk order rides scalar prefetch (SMEM). Byte-packed ids cap the walk at
# 256 supers (8-bit packed ids; slabbing caps tables at 16k spheres = 64
# chunks long before that); the SMEM budget bounds
# n_tiles * words — beyond either, fall back to the static two-level scan.
ORDER_MIN_CHUNKS = 16
ORDER_MAX_CHUNKS = 256
ORDER_SMEM_BUDGET = 600_000
# Clamp each lane's walk reach by its exit-t from the stage's global AABB
# (sky lanes otherwise keep reach infinite in open scenes). Trace-time
# constant, A/B via a fresh process (experiments/reach_clamp_bench.py).
REACH_CLAMP = True
# Debug: ordered-walk kernels also emit per-tile (chunks walked, bodies
# run). Trace-time constant — clear _call_kernel caches after toggling.
ORDER_STATS = False
_last_order_stats = None  # (walked (G,), bodies (G,)) from the last call
# feature row order (appended to every table; also the winner-slot order
# after N_GEO_SLOTS): kind, fuzz, ir, tex_kind, c0(3), c1(3), image_id, mat_id

BIG = 3.0e38  # python float: jnp scalars would be captured consts in pallas


# ----------------------------------------------------------- table packing

def _pad_cols(a, mult: int, fill: float):
    """Pad the column axis to a CHUNK multiple (min one full chunk) — jnp,
    so packing is traceable inside jit (shapes are static; the ops are tiny
    next to the kernel and fuse away)."""
    c = a.shape[1]
    cp = max(mult, -(-c // mult) * mult)
    if cp != c:
        a = jnp.pad(a, [(0, 0), (0, cp - c)], constant_values=fill)
    return a


def eff_chunk(n: int, full: int) -> int:
    """Chunk width for an n-column table: small tables use one lane-aligned
    chunk instead of a full-width pad (Cornell's 17 rects in a 512-wide
    chunk would cost 30x their work every bounce)."""
    return full if n > full else max(128, -(-max(n, 1) // 128) * 128)


def _feature_rows(scene: Scene, mat_id):
    """(12, K) material+texture feature planes for a per-primitive mat_id
    vector — denormalized host/trace side where tables are tiny."""
    m = scene.materials
    t = scene.textures
    tex = m.tex_id[mat_id]
    rows = [
        m.kind[mat_id][None], m.fuzz[mat_id][None], m.ir[mat_id][None],
        t.kind[tex][None],
        t.color0[tex].T, t.color1[tex].T,
        t.image_id[tex][None], mat_id[None],
    ]
    return jnp.concatenate([x.astype(jnp.float32) for x in rows], 0)


def _morton_order(centers):
    """Z-order sort so consecutive sphere chunks are spatially compact
    (enables per-chunk AABB culling in the kernel)."""
    lo = centers.min(0)
    hi = centers.max(0)
    q = jnp.clip(((centers - lo) / jnp.maximum(hi - lo, 1e-9) * 1023.0)
                 .astype(jnp.uint32), 0, 1023)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    return jnp.argsort(code)


def pack_tables(scene: Scene, with_motion: bool = False):
    """Pack scene tables into the kernel's component-plane layout. Empty
    tables become one fully-padded chunk whose pad values guarantee a miss.
    Spheres and multi-chunk tri tables are Morton-ordered; returns
    (sph, rect, tri, sph_cull, tri_cull, sph_scull, tri_scull) where the
    cull/scull pairs are the (6, n_chunks)/(6, n_supers) per-chunk/
    per-superchunk AABB tables and the sphere block carries an extra
    original-index row (row 4+N_FEAT). ``with_motion`` appends velocity
    rows and dilates the cull AABBs over the camera shutter (see
    SPH_VEL_ROW)."""
    sph, cull, scull = _pack_spheres(scene, with_motion)
    rec, tri, tcull, tscull = pack_rect_tri(scene)
    return sph, rec, tri, cull, tcull, scull, tscull


def _order_chunks_near_to_far(order, lo3, hi3, chunk, cam):
    """Shared sphere/tri chunk-ordering machinery.

    Near-to-far CHUNK order from the camera: the kernel's per-chunk cull
    bounds `leave` by each ray's running best_t, so chunks processed after
    the first hit mostly cull — IF a near chunk came first to shrink
    best_t. Morton gives spatially-compact chunks; sorting those chunks by
    camera distance makes the scan effectively early-exit for primary
    (and, via the origin side of the slab test, most secondary) rays.
    Large dense tables go from O(N) to ~O(chunks actually touched) per ray
    (round-3 cliff work; reference bar: bvh.rs:60-101).

    Pads the chunk count to a SUPER multiple so the kernel's two-level
    cull has static shape (pad chunks are all-miss with inverted AABBs);
    supers = consecutive Morton chunks, ordered near-to-far, members
    near-to-far within. ``order`` is the Morton primitive order;
    ``lo3``/``hi3`` are its (n, 3) per-primitive AABB corners (spheres
    pass centers for both — ordering only). Returns (order, keep) with
    pad slots clamped to index 0 and flagged False in ``keep``."""
    n = order.shape[0]
    k_raw = -(-n // chunk)
    k_ch = -(-k_raw // SUPER) * SUPER
    n_pad = k_ch * chunk
    lo3 = jnp.pad(lo3.astype(jnp.float32), [(0, n_pad - n), (0, 0)],
                  constant_values=3e38)
    hi3 = jnp.pad(hi3.astype(jnp.float32), [(0, n_pad - n), (0, 0)],
                  constant_values=-3e38)
    clo = lo3.reshape(k_ch, chunk, 3).min(1)
    chi = hi3.reshape(k_ch, chunk, 3).max(1)
    gap = jnp.maximum(jnp.maximum(clo - cam[None], cam[None] - chi), 0.0)
    gap2 = jnp.sum(gap * gap, -1)                             # (k_ch,)
    sup_gap2 = jnp.min(gap2.reshape(-1, SUPER), 1)
    sup_order = jnp.argsort(sup_gap2)                         # (k_sup,)
    within = jnp.argsort(gap2.reshape(-1, SUPER), 1)          # (k_sup, 8)
    chunk_order = (sup_order[:, None] * SUPER
                   + within[sup_order]).reshape(-1)           # (k_ch,)
    perm = (chunk_order[:, None] * chunk
            + jnp.arange(chunk)[None]).reshape(-1)
    order = jnp.pad(order, (0, n_pad - n), constant_values=-1)[perm]
    # pad slots (order == -1) must become always-miss columns downstream,
    # keyed off the returned mask
    return jnp.maximum(order, 0), order >= 0


def _wants_order(n: int, chunk: int) -> bool:
    """SUPER-pad + camera-order a multi-chunk table only when the padded
    chunk count can actually take the ordered walk; smaller tables keep
    the plain Morton layout (no pad chunks, static scan)."""
    k_ch = -(-(-(-n // chunk)) // SUPER) * SUPER
    return n > chunk and ORDER_MIN_CHUNKS <= k_ch and (
        k_ch // SUPER) <= ORDER_MAX_CHUNKS


def _pack_spheres(scene: Scene, with_motion: bool = False):
    s = scene.spheres
    n_s = s.radius.shape[0]
    with_motion = bool(with_motion and n_s
                       and s.velocity.shape[0] == n_s)
    if n_s:
        sph_chunk = eff_chunk(n_s, SPH_CHUNK)
        order = _morton_order(s.center.astype(jnp.float32))
        if _wants_order(n_s, sph_chunk):
            cen = s.center[order].astype(jnp.float32)
            order, keep = _order_chunks_near_to_far(
                order, cen, cen, sph_chunk,
                scene.camera.origin.astype(jnp.float32))
        else:
            keep = None
        c = s.center[order].T.astype(jnp.float32)          # (3, S)
        r = s.radius[order].astype(jnp.float32)
        orig = order.astype(jnp.float32)[None]
        if with_motion:
            # velocity rows (3, S) + shutter-swept AABB dilation: every
            # per-ray time lies in [time0, time1], so each sphere's cull
            # box must cover c + v*t over the whole window (conservative;
            # the exact quadratic rejects inside the kernel)
            v = s.velocity[order].T.astype(jnp.float32)
            t0 = scene.camera.time0.astype(jnp.float32)
            t1 = scene.camera.time1.astype(jnp.float32)
            vlo = jnp.minimum(v * t0, v * t1)
            vhi = jnp.maximum(v * t0, v * t1)
        else:
            v = None
            vlo = vhi = 0.0
        # row 17 = r^2: the chunk test uses the DIRECT oc = o - c quadratic
        # (exact parity with ops/intersect.py). The expanded
        # |o|^2 - 2 o.c + csq form loses ~7 bits to cancellation at
        # |o| ~ 1e3 coordinates and flipped grazing hits to misses
        # (found on the 64k field: disc = -2.6e-4 for a true hit).
        # csq (row 3) stays for the leaf kernel's winner recompute.
        rows = [c, (jnp.sum(c * c, 0) - r * r)[None],
                _feature_rows(scene, s.mat_id[order]), orig, (r * r)[None]]
        if with_motion:
            rows.append(v)
        sph = jnp.concatenate(rows, 0)
        if keep is not None:
            # interleaved pad slots (chunk-aligned): force a guaranteed miss
            sph = sph.at[3].set(jnp.where(keep, sph[3], 3e38))
            sph = sph.at[SPH_RSQ_ROW].set(
                jnp.where(keep, sph[SPH_RSQ_ROW], -3e38))
            sph = _pad_cols(sph, sph_chunk, 0.0)
            lo = jnp.where(keep[None], c - r[None] + vlo, 3e38)
            hi = jnp.where(keep[None], c + r[None] + vhi, -3e38)
        else:
            sph = _pad_cols(sph, sph_chunk, 0.0)
            sph = sph.at[3, n_s:].set(3e38)                # pad -> disc < 0
            sph = sph.at[SPH_RSQ_ROW, n_s:].set(-3e38)
            lo = c - r[None] + vlo
            hi = c + r[None] + vhi
        # per-chunk AABBs (pad entries get inverted boxes -> never expand)
        lo = _pad_cols(lo, sph_chunk, 3e38)
        hi = _pad_cols(hi, sph_chunk, -3e38)
        k = lo.shape[1] // sph_chunk
        cull = jnp.concatenate([
            lo.reshape(3, k, sph_chunk).min(2),
            hi.reshape(3, k, sph_chunk).max(2)], 0)        # (6, k)
        if k > SUPER and k % SUPER == 0:
            scull = jnp.concatenate([
                cull[0:3].reshape(3, k // SUPER, SUPER).min(2),
                cull[3:6].reshape(3, k // SUPER, SUPER).max(2)], 0)
        elif (SPH_SUB and sph_chunk > SPH_SUB and sph_chunk % SPH_SUB == 0
              and n_s >= SPH_SUB_MIN):
            # flat-scan table: scull carries SPH_SUB-granularity AABBs
            # instead (sub-chunk cull gating — see SPH_SUB above)
            scull = jnp.concatenate([
                lo.reshape(3, -1, SPH_SUB).min(2),
                hi.reshape(3, -1, SPH_SUB).max(2)], 0)
        else:
            scull = cull
    else:
        sph = (jnp.zeros((6 + N_FEAT, SPH_CHUNK), jnp.float32)
               .at[3, :].set(3e38).at[SPH_RSQ_ROW, :].set(-3e38))
        cull = jnp.concatenate([jnp.full((3, 1), 3e38),
                                jnp.full((3, 1), -3e38)], 0)
        scull = cull
    # kernel layout: (prims, components) — prims on sublanes so a chunk
    # component is a natural (C,1) column against the (1,T) ray rows
    return sph.T, cull, scull


def pack_rect_tri(scene: Scene):
    """Rect/tri component planes only (the leaf kernel packs spheres
    host-side; rebuilding the Morton-sorted sphere table per call would be
    traced into every bounce).

    Multi-chunk tri tables get the same treatment as spheres: the chunk
    count pads to a SUPER multiple, Morton-consecutive chunks group into
    superchunk AABBs (``tscull``), and chunks reorder near-to-far from the
    camera so the running best_t culls far chunks (big meshes are the one
    tri workload where this matters — bunny_field is 124k tris).
    Returns (rec, tri, tcull, tscull)."""
    rct = scene.rects
    n_r = rct.k.shape[0]
    if n_r:
        eye = jnp.eye(3, dtype=jnp.float32)
        n_hot = eye[rct.axis].T                            # (3, R)
        a_hot = eye[jnp.where(rct.axis == 0, 1, 0)].T
        b_hot = eye[jnp.where(rct.axis == 2, 1, 2)].T
        rows = [n_hot, a_hot, b_hot, rct.k[None], rct.a0[None], rct.a1[None],
                rct.b0[None], rct.b1[None]]
        rec = jnp.concatenate(
            [x.astype(jnp.float32) for x in rows]
            + [_feature_rows(scene, rct.mat_id)], 0)
        rec = _pad_cols(rec, eff_chunk(n_r, CHUNK), 0.0)
        rec = rec.at[10, n_r:].set(1.0).at[11, n_r:].set(-1.0)  # a0>a1 -> miss
    else:
        rec = jnp.zeros((14 + N_FEAT, CHUNK), jnp.float32
                        ).at[10, :].set(1.0).at[11, :].set(-1.0)

    tr = scene.triangles
    n_t = tr.mat_id.shape[0]
    if n_t:
        tri_chunk = eff_chunk(n_t, CHUNK)
        # Morton order by centroid: consecutive chunks become spatially
        # compact, enabling the per-chunk AABB cull (meshes are the one
        # primitive class big enough for it to matter — bun315 is 4,968
        # tris = 10 chunks, and primary rays see only a few)
        centroid = tr.v0 + (tr.e1 + tr.e2) / 3.0
        order = _morton_order(centroid.astype(jnp.float32))
        if _wants_order(n_t, tri_chunk):
            # near-to-far SUPER-grouped chunk order (shared with spheres;
            # pad slots interleave as guaranteed-miss columns via ``keep``)
            v0m = tr.v0[order].astype(jnp.float32)
            e1m = tr.e1[order].astype(jnp.float32)
            e2m = tr.e2[order].astype(jnp.float32)
            order, keep = _order_chunks_near_to_far(
                order,
                jnp.minimum(jnp.minimum(v0m, v0m + e1m), v0m + e2m),
                jnp.maximum(jnp.maximum(v0m, v0m + e1m), v0m + e2m),
                tri_chunk, scene.camera.origin.astype(jnp.float32))
        else:
            keep = None
        v0 = tr.v0[order]
        e1 = tr.e1[order]
        e2 = tr.e2[order]
        n_geo = jnp.cross(e1, e2)
        orig = order.astype(jnp.float32)[None]
        rows = [n_geo.T, e1.T, e2.T, jnp.cross(e2, v0).T,
                jnp.cross(e1, v0).T, jnp.sum(v0 * n_geo, -1)[None],
                tr.n0[order].T, tr.n1[order].T, tr.n2[order].T]
        tri = jnp.concatenate(
            [x.astype(jnp.float32) for x in rows]
            + [_feature_rows(scene, tr.mat_id[order]), orig], 0)
        lo = jnp.minimum(jnp.minimum(v0, v0 + e1), v0 + e2).T
        hi = jnp.maximum(jnp.maximum(v0, v0 + e1), v0 + e2).T
        if keep is not None:
            # interleaved pad slots: n_geo = 0 -> div = 0 -> safe = False
            tri = jnp.where(keep[None], tri, 0.0)
            lo = jnp.where(keep[None], lo, 3e38)
            hi = jnp.where(keep[None], hi, -3e38)
        tri = _pad_cols(tri, tri_chunk, 0.0)               # zeros -> div = 0
        lo = _pad_cols(lo, tri_chunk, 3e38)
        hi = _pad_cols(hi, tri_chunk, -3e38)
        k = lo.shape[1] // tri_chunk
        tcull = jnp.concatenate([
            lo.reshape(3, k, tri_chunk).min(2),
            hi.reshape(3, k, tri_chunk).max(2)], 0)        # (6, k)
        if k > SUPER and k % SUPER == 0:
            tscull = jnp.concatenate([
                tcull[0:3].reshape(3, k // SUPER, SUPER).min(2),
                tcull[3:6].reshape(3, k // SUPER, SUPER).max(2)], 0)
        else:
            tscull = tcull
    else:
        tri = jnp.zeros((26 + N_FEAT, CHUNK), jnp.float32)
        tcull = jnp.concatenate([jnp.full((3, 1), 3e38),
                                 jnp.full((3, 1), -3e38)], 0)
        tscull = tcull
    # (prims, components) kernel layout — see _pack_spheres
    return rec.T, tri.T, tcull, tscull


# ----------------------------------------------------------------- kernel

def _fold(carry, t, ok, base, code, plane_block, plane_slots, computed):
    """Fold one chunk's (C,T) t-matrix into the running best, extracting
    the winner's geometry + material features.

    ``plane_block`` is a (C, R) slice of the table; its winner values land
    in ``plane_slots`` via ONE block^T @ onehot matmul on the MXU (replacing
    R separate VPU reductions). ``computed`` maps slot -> per-pair (C, T)
    arrays (triangle barycentrics) reduced on the VPU. ``ok`` may be None
    when ``t`` is already miss-masked to BIG (sub-gated scan). Pure: carry
    is (best_t (1,T), best_ty, best_ix, best_data (N_SLOTS,T))."""
    best_t, best_ty, best_ix, best_data = carry
    tt = t if ok is None else jnp.where(ok, t, BIG)
    m = jnp.min(tt, axis=0, keepdims=True)                  # (1,T)
    row = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 0).astype(jnp.float32)
    midx = jnp.min(jnp.where(tt <= m, row, BIG), axis=0, keepdims=True)
    better = m < best_t
    onehot = (row == midx).astype(jnp.float32)              # (C,T)
    # precision=HIGHEST: on TPU, f32 matmuls default to bf16 passes, which
    # would round the extracted winner geometry (e.g. 555 -> 556) and skew
    # normals/UVs — same guard as every geometry matmul in ops/intersect.py.
    vals = jax.lax.dot_general(                             # (R,T) MXU
        plane_block, onehot,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    rows = [None] * N_SLOTS
    for r, slot in enumerate(plane_slots):
        rows[slot] = vals[r:r + 1, :]
    for slot, arr in computed:
        rows[slot] = jnp.sum(onehot * arr, axis=0, keepdims=True)
    assembled = jnp.concatenate(
        [c if c is not None else jnp.zeros_like(m) for c in rows], axis=0)
    best_data = jnp.where(better, assembled, best_data)
    best_t = jnp.where(better, m, best_t)
    best_ty = jnp.where(better, float(code), best_ty)
    best_ix = jnp.where(better, midx + base, best_ix)
    return best_t, best_ty, best_ix, best_data


class RayVals(NamedTuple):
    """Per-ray (1, TILE) rows shared by all kernel stages."""
    ox: jnp.ndarray
    oy: jnp.ndarray
    oz: jnp.ndarray
    dx: jnp.ndarray
    dy: jnp.ndarray
    dz: jnp.ndarray
    tmin: jnp.ndarray
    tmax: jnp.ndarray
    a: jnp.ndarray
    inv_a: jnp.ndarray
    o_dot_d: jnp.ndarray
    o_sq: jnp.ndarray
    inv_dx: jnp.ndarray
    inv_dy: jnp.ndarray
    inv_dz: jnp.ndarray
    time: jnp.ndarray = None  # (1,T) shutter time or None (no motion)


def ray_vals(o_ref, d_ref, tmin_ref, tmax_ref, time_ref=None) -> RayVals:
    """Rays arrive TRANSPOSED: o_ref/d_ref are (3, TILE), the scalar refs
    (1, TILE) — each component is a natural lane row."""
    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]   # (1,T)
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    a = dx * dx + dy * dy + dz * dz                             # (1,T)
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


def init_carry(rv: RayVals):
    best_t = jnp.minimum(rv.tmax, BIG)
    return (best_t, jnp.full_like(best_t, -1.0),
            jnp.full_like(best_t, -1.0),
            jnp.zeros((N_SLOTS, best_t.shape[1]), jnp.float32))


# slot layout for a sphere winner: geometry, features, original index, r^2
SPHERE_SLOTS = (list(range(4)) + list(range(N_GEO_SLOTS, N_SLOTS))
                + [14, SPH_RSQ_SLOT])


def _tile_slab_any(rv: RayVals, box_ref, jc, best_t):
    """Whole-ray-tile slab test vs one table AABB column: True if ANY lane's
    [tmin, min(best_t, tmax)] segment can touch box jc. Delegates to the
    explicit-operand form (one copy of the enter/leave math)."""
    return _tile_slab_any_vals(rv, box_ref[0, jc], box_ref[1, jc],
                               box_ref[2, jc], box_ref[3, jc],
                               box_ref[4, jc], box_ref[5, jc], best_t)


def _sphere_chunk_tests(rv: RayVals, blk):
    """Quadratic candidate tests for one (C, rows) sphere table slice:
    returns (t (C,T), ok (C,T)) for the fold.

    NOTE (round-3 layout): moving these dot products onto the MXU was
    measured SLOWER (65 vs 42-47 ms per 960k cast) — the K=3 matmul +
    operand relayouts cost more than the 10 VPU broadcast passes they
    replace. Kept on the VPU."""
    cx = blk[:, 0:1]                                            # (C,1)
    cy = blk[:, 1:2]
    cz = blk[:, 2:3]
    rsq = blk[:, SPH_RSQ_ROW:SPH_RSQ_ROW + 1]
    # motion blur: c(t) = c + v * t_ray (centers become (C,T)); the
    # velocity columns exist only in motion-scene tables (static shape test)
    has_vel = rv.time is not None and blk.shape[1] > SPH_VEL_ROW
    if has_vel:
        cx = cx + blk[:, SPH_VEL_ROW:SPH_VEL_ROW + 1] * rv.time
        cy = cy + blk[:, SPH_VEL_ROW + 1:SPH_VEL_ROW + 2] * rv.time
        cz = cz + blk[:, SPH_VEL_ROW + 2:SPH_VEL_ROW + 3] * rv.time
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
    return t, (disc >= 0.0)


def _sphere_slots(rv: RayVals, blk):
    """Winner slots for a sphere table slice: motion tables additionally
    extract the winner's velocity into slots 4..6 (rows 18..20 follow the
    18 static rows in plane order)."""
    has_vel = rv.time is not None and blk.shape[1] > SPH_VEL_ROW
    return SPHERE_SLOTS + (SPH_VEL_SLOTS if has_vel else [])


def _sphere_chunk_fold(c, rv: RayVals, blk, base):
    """One sphere chunk's quadratic tests + fold. ``blk`` is the loaded
    (C, rows) table slice; ``base`` the chunk's first column (python float
    for the static walk, traced f32 scalar for the ordered walk)."""
    t, ok = _sphere_chunk_tests(rv, blk)
    return _fold(c, t, ok, base, PRIM_SPHERE, blk, _sphere_slots(rv, blk),
                 [])


def sphere_stage(carry, rv: RayVals, sph_ref, cull_ref, n_sph: int,
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
    nsub = chunk // SPH_SUB if SPH_SUB else 1
    # flat-scan tables may carry a SUB-granularity cull table in the
    # (otherwise unused) scull slot — static shape test (pack side gate)
    sub_gated = (scull_ref is not None and nsub > 1
                 and scull_ref.shape[1] == n_ch * nsub)

    def run_chunk(c, j):
        any_hit = _tile_slab_any(rv, cull_ref, j // chunk, c[0])

        def chunk_body(c, j=j):
            return _sphere_chunk_fold(c, rv, sph_ref[j:j + chunk, :],
                                      float(j))

        return jax.lax.cond(any_hit, chunk_body, lambda c: c, c)

    def run_chunk_sub(c, j):
        """Chunk body with SPH_SUB-granularity gating: each 64-wide
        sub-block's candidate tests run only when the tile's slab test
        enters its AABB (bounded by the tile's running best_t), but the
        winner fold stays ONE chunk-wide _fold — cull selectivity of a
        4x-finer chunk without 4x the per-chunk fold/extraction fixed
        cost (round-5 headline work: measured cull rates in
        experiments/headline_cull_stats.py; the all-fine-chunk scan and
        the ordered walk both measured SLOWER at this scale)."""
        jc = j // chunk
        any_hit = _tile_slab_any(rv, cull_ref, jc, c[0])

        def chunk_body(c, j=j, jc=jc):
            T = rv.ox.shape[1]
            # branches return ONE miss-masked f32 matrix: a (t, ok-bool)
            # tuple fails Mosaic's scf.if legalization (i1 vector results)
            miss = jnp.full((SPH_SUB, T), BIG, jnp.float32)

            def sub_tests(sub_blk):
                t, ok = _sphere_chunk_tests(rv, sub_blk)
                return jnp.where(ok, t, BIG)

            parts = []
            for s in range(nsub):
                sub_blk = sph_ref[j + s * SPH_SUB:j + (s + 1) * SPH_SUB, :]
                sub_any = _tile_slab_any(rv, scull_ref, jc * nsub + s, c[0])
                parts.append(jax.lax.cond(
                    sub_any,
                    lambda sub_blk=sub_blk: sub_tests(sub_blk),
                    lambda: miss))
            blk = sph_ref[j:j + chunk, :]
            return _fold(c, jnp.concatenate(parts, 0), None, float(j),
                         PRIM_SPHERE, blk, _sphere_slots(rv, blk), [])

        return jax.lax.cond(any_hit, chunk_body, lambda c: c, c)

    # two-level culling needs a whole number of SUPER groups; tables the
    # packer left un-grouped (plain Morton layout) flat-scan their chunks
    if scull_ref is None or n_ch <= SUPER or n_ch % SUPER != 0:
        for j in range(0, n_sph, chunk):
            carry = (run_chunk_sub if sub_gated else run_chunk)(carry, j)
        return carry

    # two-level: superchunk slab test gates its SUPER member chunks
    for s_i in range(n_ch // SUPER):
        any_super = _tile_slab_any(rv, scull_ref, s_i, carry[0])

        def super_body(c, s_i=s_i):
            for m in range(SUPER):
                c = run_chunk(c, (s_i * SUPER + m) * chunk)
            return c

        carry = jax.lax.cond(any_super, super_body, lambda c: c, carry)
    return carry


def _tile_chunk_order(o_t, alive, scull, tile):
    """Per-ray-tile near-to-far SUPERCHUNK walk order, byte-packed for
    scalar prefetch (4 ids per i32 word). ``o_t`` is the TRANSPOSED (3, N)
    origin array (the same operand the kernel receives).

    The gap math (tile alive-origin AABB vs superchunk AABB) mirrors
    ``stage_ordered`` exactly: min/max/sub are rounding-free given
    identical operands and the squared sum uses the same term order, so
    the kernel's recomputed gap agrees with this ordering bit-for-bit.
    Returns (words (G*W,) i32, W)."""
    g = o_t.shape[1] // tile
    k = scull.shape[1]
    to = o_t.reshape(3, g, tile)
    am = (alive.reshape(g, tile) > 0.5)[None]                 # (1,G,T)
    tlo = jnp.min(jnp.where(am, to, BIG), 2)                  # (3,G)
    thi = jnp.max(jnp.where(am, to, -BIG), 2)
    clo = scull[0:3][:, None]                                 # (3,1,K)
    chi = scull[3:6][:, None]
    gap = jnp.maximum(jnp.maximum(clo - thi[:, :, None],
                                  tlo[:, :, None] - chi), 0.0)   # (3,G,K)
    g2 = gap[0] * gap[0] + gap[1] * gap[1] + gap[2] * gap[2]  # (G,K)
    order = jnp.argsort(g2, axis=1).astype(jnp.int32)
    w = -(-k // 4)
    order = jnp.pad(order, [(0, 0), (0, w * 4 - k)])
    words = (order[:, 0::4] | (order[:, 1::4] << 8)
             | (order[:, 2::4] << 16) | (order[:, 3::4] << 24))
    return words.reshape(-1), w


def stage_ordered(carry, rv: RayVals, alive, chunk_fold, order_ref,
                  cull_ref, tile, *, w_words: int, k_ch: int,
                  word_base: int = 0, cull_base: int = 0,
                  stage_box_ref=None):
    """Per-tile distance-ordered dynamic SUPERCHUNK walk — the dense
    kernel's O(chunks-actually-reachable) mode for large tables (the
    answer to bvh.rs:60-101 at 16k+ primitives). Generic over the
    primitive test: ``chunk_fold(carry, idx)`` folds chunk ``idx`` (a
    traced i32) of the stage's own VMEM table; sphere fields and big
    triangle meshes share the walk.

    Granularity matters: all per-walk-step math runs on per-ray vectors
    plus cross-vector reductions and SMEM scalar reads, so a per-CHUNK
    walk spent more on loop overhead than it saved in bodies (measured in
    the round-3 column layout: 72-chunk walk ~2.5 us/tile/step — as much
    time skipping as scanning; the round-4 row layout cuts the vector ops
    16x but the SMEM reads and while_loop step cost remain). The walk
    therefore visits SUPER-chunk groups (8 Morton-consecutive chunks):
    k/8 dynamic steps, each gating a static 8-member inner loop identical
    to the static path's ``super_body``.

    Supers are visited in THIS TILE's near-to-far order (``order_ref``,
    byte-packed ids in SMEM; built per bounce by :func:`_tile_chunk_order`
    from the lanes' actual origins, so it adapts to secondary bounces
    where the pack-time camera order is useless). Each step reads the
    super AABB from the SMEM cull table, recomputes the tile gap, and
    TERMINATES the walk once the gap exceeds every alive lane's remaining
    reach max(best_t * |d|) — all farther supers are unhittable since the
    order is ascending in gap. Near-to-far processing also shrinks best_t
    early, so member slab tests prune harder than the static camera-order
    scan (measured: 22 -> ~11 chunk bodies per tile on 64k-field bounce
    wavefronts). ``tile`` is the program id, hoisted by the caller
    (pl.program_id inside lax.cond has no interpret-mode lowering).

    ``cull_ref`` holds this stage's flattened [chunk culls (6*k_ch) |
    super culls (6*k_sup)] starting at ``cull_base`` (stages share one
    SMEM table); ``order_ref`` likewise holds this stage's words at
    ``word_base``. ``k_ch`` chunks must be a SUPER multiple.

    ``stage_box_ref`` (optional): this stage's VMEM cull table (6, k) —
    rows [lox,loy,loz,hix,hiy,hiz]; pad chunks carry inverted boxes so
    plain row min/max reductions give the STAGE's global AABB. Every hit
    this stage can produce lies inside that box, so each lane's remaining
    reach is additionally capped by its exit-t from it. Without the cap,
    any sky-bound lane keeps best_t = tmax = BIG and ``done_now`` never
    fires on open-scene bounce wavefronts (measured round 3: "bounce all"
    walked every super); with it, outward-heading lanes get a finite
    reach the moment the walk starts."""
    k_sup = k_ch // SUPER
    am = alive > 0.5
    t_cap = None
    if stage_box_ref is not None:
        sblo_x = jnp.min(stage_box_ref[0:1, :])
        sblo_y = jnp.min(stage_box_ref[1:2, :])
        sblo_z = jnp.min(stage_box_ref[2:3, :])
        sbhi_x = jnp.max(stage_box_ref[3:4, :])
        sbhi_y = jnp.max(stage_box_ref[4:5, :])
        sbhi_z = jnp.max(stage_box_ref[5:6, :])
        t0x = (sblo_x - rv.ox) * rv.inv_dx
        t1x = (sbhi_x - rv.ox) * rv.inv_dx
        t0y = (sblo_y - rv.oy) * rv.inv_dy
        t1y = (sbhi_y - rv.oy) * rv.inv_dy
        t0z = (sblo_z - rv.oz) * rv.inv_dz
        t1z = (sbhi_z - rv.oz) * rv.inv_dz
        enter = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                        jnp.minimum(t0y, t1y)),
                            jnp.maximum(jnp.minimum(t0z, t1z), rv.tmin))
        leave = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                        jnp.maximum(t0y, t1y)),
                            jnp.maximum(t0z, t1z))
        # 1e-3 relative slack (conservative direction: a LARGER cap only
        # weakens the cull) absorbs the f32 rounding between this slab
        # arithmetic and the chunk bodies' exact hit t
        t_cap = jnp.where(enter <= leave, leave * 1.001 + 1e-4, 0.0)
    tlo_x = jnp.min(jnp.where(am, rv.ox, BIG))
    tlo_y = jnp.min(jnp.where(am, rv.oy, BIG))
    tlo_z = jnp.min(jnp.where(am, rv.oz, BIG))
    thi_x = jnp.max(jnp.where(am, rv.ox, -BIG))
    thi_y = jnp.max(jnp.where(am, rv.oy, -BIG))
    thi_z = jnp.max(jnp.where(am, rv.oz, -BIG))
    d_len = jnp.sqrt(rv.a)                                    # (T,1)
    cbase = cull_base
    sbase = cull_base + 6 * k_ch

    def cond(state):
        pos, done = state[0], state[1]
        return (pos < k_sup) & (done == 0)

    def body(state):
        pos, _, nbod, c0, c1, c2, c3 = state
        word = order_ref[word_base + tile * w_words + pos // 4]
        sidx = (word >> (8 * (pos % 4))) & 0xFF
        lox = cull_ref[sbase + sidx]
        loy = cull_ref[sbase + k_sup + sidx]
        loz = cull_ref[sbase + 2 * k_sup + sidx]
        hix = cull_ref[sbase + 3 * k_sup + sidx]
        hiy = cull_ref[sbase + 4 * k_sup + sidx]
        hiz = cull_ref[sbase + 5 * k_sup + sidx]
        gx = jnp.maximum(jnp.maximum(lox - thi_x, tlo_x - hix), 0.0)
        gy = jnp.maximum(jnp.maximum(loy - thi_y, tlo_y - hiy), 0.0)
        gz = jnp.maximum(jnp.maximum(loz - thi_z, tlo_z - hiz), 0.0)
        g2 = gx * gx + gy * gy + gz * gz
        # remaining reach: a lane can only hit within t <= best_t, i.e.
        # within best_t*|d| of its origin (>= gap for any chunk point).
        # 1e-3 relative slack absorbs the f32 rounding between this g2
        # and the squared reach (the gap itself matches the XLA order
        # exactly — see _tile_chunk_order)
        c0_cap = c0 if t_cap is None else jnp.minimum(c0, t_cap)
        reach = jnp.max(jnp.where(am, c0_cap * d_len, 0.0))
        done_now = g2 > reach * reach * 1.001 + 1e-9
        carry = (c0, c1, c2, c3)

        def run(state, sidx=sidx):
            nbod, c = state[0], state[1:]
            cap = c[0] if t_cap is None else jnp.minimum(c[0], t_cap)
            slab_super = _tile_slab_any_vals(
                rv, lox, loy, loz, hix, hiy, hiz, cap)

            def super_body(state):
                nbod, c = state[0], state[1:]
                for m in range(SUPER):
                    idx = sidx * SUPER + m
                    mlox = cull_ref[cbase + idx]
                    mloy = cull_ref[cbase + k_ch + idx]
                    mloz = cull_ref[cbase + 2 * k_ch + idx]
                    mhix = cull_ref[cbase + 3 * k_ch + idx]
                    mhiy = cull_ref[cbase + 4 * k_ch + idx]
                    mhiz = cull_ref[cbase + 5 * k_ch + idx]
                    mcap = (c[0] if t_cap is None
                            else jnp.minimum(c[0], t_cap))
                    slab = _tile_slab_any_vals(
                        rv, mlox, mloy, mloz, mhix, mhiy, mhiz, mcap)

                    def chunk_body(c, idx=idx):
                        return chunk_fold(c, idx)

                    c = jax.lax.cond(slab, chunk_body, lambda c: c, c)
                    nbod = nbod + slab.astype(jnp.int32)
                return (nbod,) + c

            return jax.lax.cond(slab_super, super_body, lambda s: s,
                                (nbod,) + c)

        state = jax.lax.cond(done_now, lambda s: s, run, (nbod,) + carry)
        return (pos + 1, done_now.astype(jnp.int32)) + state

    state = (jnp.int32(0), jnp.int32(0), jnp.int32(0)) + carry
    state = jax.lax.while_loop(cond, body, state)
    # (carry, supers_walked, chunk_bodies_run) — the counters feed the
    # stats outputs of the debug path (ORDER_STATS) and fold away otherwise
    return state[3:], state[0], state[2]


def _tile_slab_any_vals(rv: RayVals, lox, loy, loz, hix, hiy, hiz, best_t):
    """_tile_slab_any against explicit AABB scalars (ordered walk reads
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


def rect_stage(carry, rv: RayVals, rect_ref, n_rect: int):
    """Axis-rect plane tests (rectangle.rs semantics)."""
    chunk = eff_chunk(n_rect, CHUNK)
    for j in range(0, n_rect, chunk):
        blk = rect_ref[j:j + chunk, :]                          # (C, rows)
        planes = [blk[:, r:r + 1] for r in range(14)]           # (C,1) each
        (nx, ny, nz, ax_, ay, az, bx, by, bz, k, a0, a1, b0, b1) = planes
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
        carry = _fold(carry, t, ok, float(j), PRIM_RECT, blk,
                      list(range(14)) + list(range(N_GEO_SLOTS, N_SLOTS)), [])
    return carry


def _tri_oxd(rv: RayVals):
    """o x d cross-product columns shared by every tri chunk body."""
    return (rv.oy * rv.dz - rv.oz * rv.dy,
            rv.oz * rv.dx - rv.ox * rv.dz,
            rv.ox * rv.dy - rv.oy * rv.dx)


def _tri_chunk_fold(c, rv: RayVals, oxd, blk, base):
    """One tri chunk's scalar-triple-product Möller–Trumbore tests + fold
    (mesh.rs:57-98 semantics). ``blk`` is the loaded (C, rows) table slice;
    ``base`` the chunk's first column (python float for the static walk,
    traced f32 scalar for the ordered walk)."""
    oxd_x, oxd_y, oxd_z = oxd
    ox, oy, oz, dx, dy, dz = rv.ox, rv.oy, rv.oz, rv.dx, rv.dy, rv.dz
    pr = [blk[:, r:r + 1] for r in range(16)]
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
    return _fold(c, t, ok, base, PRIM_TRIANGLE, blk[:, 16:],
                 list(range(2, 11))
                 + list(range(N_GEO_SLOTS, N_SLOTS)) + [14],
                 [(0, b1), (1, b2)])


def tri_stage(carry, rv: RayVals, tri_ref, tcull_ref, n_tri: int):
    """Chunk-culled Möller–Trumbore (mesh.rs:57-98 semantics). Triangles
    are Morton-ordered with per-chunk AABBs (tcull_ref), so mesh chunks a
    ray's slab misses are cond-skipped like the sphere chunks."""
    oxd = _tri_oxd(rv)
    chunk = eff_chunk(n_tri, CHUNK)
    for j in range(0, n_tri, chunk):
        any_hit = _tile_slab_any(rv, tcull_ref, j // chunk, carry[0])

        def chunk_body(c, j=j):
            return _tri_chunk_fold(c, rv, oxd, tri_ref[j:j + chunk, :],
                                   float(j))

        carry = jax.lax.cond(any_hit, chunk_body, lambda c: c, carry)
    return carry


def finish_carry(carry, t_out, ty_out, ix_out, data_out):
    """Write the folded winner to the output refs (shared epilogue)."""
    best_t, best_ty, best_ix, best_data = carry
    miss = best_ty < 0.0
    # spheres and triangles are Morton-reordered; slot 14 carries the
    # original index for both
    best_ix = jnp.where((best_ty == float(PRIM_SPHERE))
                        | (best_ty == float(PRIM_TRIANGLE)),
                        best_data[14:15, :], best_ix)
    t_out[:] = jnp.where(miss, BIG, best_t)  # mapped to +inf by the wrapper
    ty_out[:] = best_ty.astype(jnp.int32)
    ix_out[:] = best_ix.astype(jnp.int32)
    data_out[:] = best_data


def _stage_sweep(rv: RayVals, alive, sph_ref, rect_ref, tri_ref, cull_ref,
                 tcull_ref, scull_ref, *, n_sph: int, n_rect: int,
                 n_tri: int, order_ref=None, cullf_ref=None, sph_cfg=None,
                 tri_cfg=None):
    """Run every primitive stage over one ray tile and return the folded
    (carry, supers_walked, chunk_bodies) — the shared heart of the
    closest-hit and fused-bounce kernels, static and ordered variants.

    With ``sph_cfg``/``tri_cfg`` (static (w_words, k_ch, chunk, word_base,
    cull_base) tuples), that stage runs the per-tile dynamic near-to-far
    superchunk walk (``stage_ordered``) via the SMEM ``order_ref``/
    ``cullf_ref`` prefetch tables; stages below the ordering threshold
    keep the static scan (their VMEM cull tables ride along regardless —
    they are (6, k) slivers). A whole-tile skip covers fully-retired
    tiles: a value-returning cond keeps the callers' output writes
    unconditional (conditional ref stores stall the Mosaic output
    pipeline)."""
    any_alive = jnp.any(alive > 0.5)
    tile = pl.program_id(0) if (sph_cfg or tri_cfg) else 0

    def live(state):
        carry, walked, nbod = state
        if sph_cfg is not None:
            w_words, k_ch, chunk, wb, cb = sph_cfg

            def sph_fold(c, idx, chunk=chunk):
                j0 = pl.multiple_of(idx * chunk, chunk)
                return _sphere_chunk_fold(
                    c, rv, sph_ref[pl.ds(j0, chunk), :],
                    (idx * chunk).astype(jnp.float32))

            carry, w, b = stage_ordered(
                carry, rv, alive, sph_fold, order_ref, cullf_ref, tile,
                w_words=w_words, k_ch=k_ch, word_base=wb, cull_base=cb,
                stage_box_ref=scull_ref if REACH_CLAMP else None)
            walked, nbod = walked + w, nbod + b
        else:
            carry = sphere_stage(carry, rv, sph_ref, cull_ref, n_sph,
                                 scull_ref=scull_ref)
        carry = rect_stage(carry, rv, rect_ref, n_rect)
        if tri_cfg is not None:
            w_words, k_ch, chunk, wb, cb = tri_cfg
            oxd = _tri_oxd(rv)

            def tri_fold(c, idx, chunk=chunk):
                j0 = pl.multiple_of(idx * chunk, chunk)
                return _tri_chunk_fold(
                    c, rv, oxd, tri_ref[pl.ds(j0, chunk), :],
                    (idx * chunk).astype(jnp.float32))

            carry, w, b = stage_ordered(
                carry, rv, alive, tri_fold, order_ref, cullf_ref, tile,
                w_words=w_words, k_ch=k_ch, word_base=wb, cull_base=cb,
                stage_box_ref=tcull_ref if REACH_CLAMP else None)
            walked, nbod = walked + w, nbod + b
        else:
            carry = tri_stage(carry, rv, tri_ref, tcull_ref, n_tri)
        return carry, walked, nbod

    z = jnp.int32(0)
    return jax.lax.cond(any_alive, live, lambda s: s,
                        (init_carry(rv), z, z))


def _closest_kernel(o_ref, d_ref, tmin_ref, tmax_ref, alive_ref,
                    *refs, n_sph: int, n_rect: int, n_tri: int,
                    has_time: bool = False):
    # motion-scene programs carry an extra per-ray time operand after alive
    time_ref, refs = (refs[0], refs[1:]) if has_time else (None, refs)
    (sph_ref, rect_ref, tri_ref, cull_ref, tcull_ref, scull_ref,
     t_out, ty_out, ix_out, data_out) = refs
    rv = ray_vals(o_ref, d_ref, tmin_ref, tmax_ref, time_ref)
    carry, _, _ = _stage_sweep(rv, alive_ref[:], sph_ref, rect_ref, tri_ref,
                               cull_ref, tcull_ref, scull_ref, n_sph=n_sph,
                               n_rect=n_rect, n_tri=n_tri)
    finish_carry(carry, t_out, ty_out, ix_out, data_out)


def _closest_kernel_ordered(order_ref, cullf_ref, o_ref, d_ref, tmin_ref,
                            tmax_ref, alive_ref, *refs,
                            n_sph: int, n_rect: int, n_tri: int,
                            sph_cfg, tri_cfg, has_time: bool = False):
    """Ordered-walk twin of _closest_kernel (see _stage_sweep).
    With ORDER_STATS, two extra outputs carry the per-tile walk length and
    chunk-body count summed over ordered stages (broadcast across lanes)."""
    time_ref, refs = (refs[0], refs[1:]) if has_time else (None, refs)
    (sph_ref, rect_ref, tri_ref, cull_ref, tcull_ref, scull_ref,
     t_out, ty_out, ix_out, data_out, *stats_out) = refs
    rv = ray_vals(o_ref, d_ref, tmin_ref, tmax_ref, time_ref)
    carry, walked, nbod = _stage_sweep(
        rv, alive_ref[:], sph_ref, rect_ref, tri_ref, cull_ref, tcull_ref,
        scull_ref, n_sph=n_sph, n_rect=n_rect, n_tri=n_tri,
        order_ref=order_ref, cullf_ref=cullf_ref, sph_cfg=sph_cfg,
        tri_cfg=tri_cfg)
    finish_carry(carry, t_out, ty_out, ix_out, data_out)
    if stats_out:
        stats_out[0][:] = jnp.full(t_out.shape, walked, jnp.int32)
        stats_out[1][:] = jnp.full(t_out.shape, nbod, jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_sph", "n_rect", "n_tri",
                                             "interpret"))
def _call_kernel(o, d, tmin, tmax, alive, sph, rect, tri, cull, tcull,
                 scull, tscull, *, n_sph, n_rect, n_tri, interpret,
                 time=None):
    n = o.shape[0]
    tile = tile_for(n_tri)
    n_pad = -(-n // tile) * tile
    pad = n_pad - n
    if pad:
        o = jnp.pad(o, [(0, pad), (0, 0)])
        d = jnp.pad(d, [(0, pad), (0, 0)])   # zero dir -> all tests miss
        tmin = jnp.pad(tmin, [(0, pad)])
        tmax = jnp.pad(tmax, [(0, pad)])
        alive = jnp.pad(alive, [(0, pad)])   # pad lanes are dead
        if time is not None:
            time = jnp.pad(time, [(0, pad)])
    alive = alive.astype(jnp.float32)
    # kernel layout: rays on the LANE axis — components as (3, N)/(1, N)
    # rows (one XLA relayout per cast; ~30 us at 960k lanes vs the kernel's
    # milliseconds, and the wavefront holds (N,) components anyway)
    o_t = o.T
    d_t = d.T

    sph_chunk = eff_chunk(n_sph, SPH_CHUNK) if n_sph else SPH_CHUNK
    tri_chunk = eff_chunk(n_tri, CHUNK) if n_tri else CHUNK
    n_tiles = n_pad // tile
    sph_ord, tri_ord = _order_flags(
        n_sph=n_sph, n_tri=n_tri, sph_chunk=sph_chunk, tri_chunk=tri_chunk,
        cull=cull, scull=scull, tcull=tcull, tscull=tscull, n_tiles=n_tiles)
    if sph_ord or tri_ord:
        return _call_kernel_ordered(
            o_t, d_t, tmin, tmax, alive, sph, rect, tri, cull, tcull, scull,
            tscull, n_sph=n_sph, n_rect=n_rect, n_tri=n_tri,
            sph_ord=sph_ord, tri_ord=tri_ord, sph_chunk=sph_chunk,
            tri_chunk=tri_chunk, interpret=interpret, n=n, time=time,
            tile=tile)
    ray_ins = [o_t, d_t, tmin[None], tmax[None], alive[None]]
    ray_widths = [3, 3, 1, 1, 1]
    if time is not None:
        ray_ins.append(time[None])
        ray_widths.append(1)

    grid = (n_pad // tile,)
    kernel = functools.partial(_closest_kernel, n_sph=n_sph, n_rect=n_rect,
                               n_tri=n_tri, has_time=time is not None)
    flops_per_ray = 40 * n_sph + 60 * n_rect + 80 * n_tri
    rs = lambda w: pl.BlockSpec((w, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
    t, ty, ix, data = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[rs(w) for w in ray_widths]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=[rs(1), rs(1), rs(1), rs(N_SLOTS)],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((N_SLOTS, n_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_per_ray * n_pad, bytes_accessed=n_pad * 100,
            transcendentals=n_pad * max(1, n_sph)),
        interpret=interpret,
    )(*ray_ins, sph, rect, tri, cull, tcull, scull)
    t = t[0, :n]
    return (jnp.where(t >= BIG, jnp.inf, t), ty[0, :n], ix[0, :n],
            data[:, :n], None)


def _call_kernel_ordered(o_t, d_t, tmin, tmax, alive, sph, rect, tri, cull,
                         tcull, scull, tscull, *, n_sph, n_rect, n_tri,
                         sph_ord, tri_ord, sph_chunk, tri_chunk,
                         interpret, n, time=None, tile=TILE):
    """Ordered-walk pallas call (inputs pre-padded to a ``tile`` multiple;
    ``o_t``/``d_t`` already transposed to (3, N)).
    Each ordered stage's per-tile superchunk order + flattened chunk+super
    cull tables ride scalar prefetch into SMEM (concatenated, with static
    word/cull base offsets in the stage configs); stage work is bounded by
    chunks a tile can actually reach instead of the whole table."""
    n_pad = o_t.shape[1]
    words, cullf, sph_cfg, tri_cfg = _build_order_operands(
        o_t, alive, cull, scull, tcull, tscull, sph_ord=sph_ord,
        tri_ord=tri_ord, sph_chunk=sph_chunk, tri_chunk=tri_chunk,
        tile=tile)
    ray_ins = [o_t, d_t, tmin[None], tmax[None], alive[None]]
    ray_widths = [3, 3, 1, 1, 1]
    if time is not None:
        ray_ins.append(time[None])
        ray_widths.append(1)

    grid = (n_pad // tile,)
    kernel = functools.partial(_closest_kernel_ordered, n_sph=n_sph,
                               n_rect=n_rect, n_tri=n_tri,
                               sph_cfg=sph_cfg, tri_cfg=tri_cfg,
                               has_time=time is not None)
    # cost model: a tile visits a handful of chunks after the first bounce;
    # charge ~1/8 of each ordered stage's dense scan plus full static stages
    flops_per_ray = ((40 * n_sph // 8 if sph_ord else 40 * n_sph)
                     + 60 * n_rect
                     + (80 * n_tri // 8 if tri_ord else 80 * n_tri))
    rs = lambda w: pl.BlockSpec((w, tile), lambda i, *_: (0, i),
                                memory_space=pltpu.VMEM)
    n_stats = 2 if ORDER_STATS else 0
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[rs(w) for w in ray_widths]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=[rs(1), rs(1), rs(1), rs(N_SLOTS)]
            + [rs(1)] * n_stats),
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((N_SLOTS, n_pad), jnp.float32),
        ] + [jax.ShapeDtypeStruct((1, n_pad), jnp.int32)] * n_stats,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_ray * n_pad, bytes_accessed=n_pad * 100,
            transcendentals=n_pad * max(sph_chunk, tri_chunk)),
        interpret=interpret,
    )(words, cullf, *ray_ins, sph, rect, tri, cull, tcull, scull)
    t, ty, ix, data = out[:4]
    stats = (tuple(s[0, ::tile] for s in out[4:]) if n_stats else None)
    t = t[0, :n]
    return (jnp.where(t >= BIG, jnp.inf, t), ty[0, :n], ix[0, :n],
            data[:, :n], stats)


# Per-kernel-call table capacities within the ~16 MB VMEM budget
# (alongside ray tiles). The round-4 (prims, components) table layout puts
# components on the LANE axis, so every primitive pads to one full
# 128-lane row: 512 B/prim regardless of type (vs 80-152 B/prim in the
# round-3 component-plane layout) — the price of (C,1)-column chunk
# slices that broadcast against (1,T) ray rows with zero relayouts.
# 16384 spheres = 8 MB; 12288 tris = 6 MB. Larger tables run as a chain
# of Morton-SLABBED kernel calls (_run_slabbed) whose running-best t_max
# chaining culls far slabs; a lane-packed G-group layout (G prims per
# 128-lane row) could recover the dense density if the extra slab calls
# ever dominate (measured first — see ROUND_NOTES round 4).
SPH_SLAB = 16384
TRI_SLAB = 12288


def _slab_id_rows(order, n: int, slab: int):
    """(K, slab) int32 id rows covering ``order[slab:]``. The final partial
    row pads by REPEATING its last id — duplicate geometry is winner-neutral
    (same t, same global id after remap) and keeps every scanned slab the
    same static shape, which is the whole point: one kernel compile."""
    rows = []
    for lo in range(slab, n, slab):
        idx = order[lo:lo + slab]
        if idx.shape[0] < slab:
            idx = jnp.concatenate(
                [idx, jnp.broadcast_to(idx[-1:], (slab - idx.shape[0],))])
        rows.append(idx)
    return jnp.stack(rows) if rows else None


def _fold_slab(best, tmax_cur, t_i, ty_i, ix_i, data_i):
    """Strict-< winner fold: the earlier (nearer-ordered) slab keeps ties,
    matching the in-kernel first-chunk-wins rule."""
    better = t_i < best[0]
    best = (jnp.where(better, t_i, best[0]),
            jnp.where(better, ty_i, best[1]),
            jnp.where(better, ix_i, best[2]),
            jnp.where(better[None, :], data_i, best[3]))
    tmax_cur = jnp.minimum(tmax_cur,
                           jnp.where(jnp.isfinite(best[0]), best[0], BIG))
    return best, tmax_cur


def _remap_winner_ids(ty_i, ix_i, data_i, prim, ids):
    """Slab-local winner ids (ix and data slot 14) -> global primitive id."""
    gix = ids[jnp.clip(ix_i, 0, ids.shape[0] - 1)]
    ix_i = jnp.where(ty_i == prim, gix, ix_i)
    data_i = data_i.at[14].set(
        jnp.where(ty_i == prim, ix_i.astype(jnp.float32), data_i[14]))
    return ix_i, data_i


def _run_slabbed(scene: Scene, o, d, t_min, t_max, alive, time=None):
    """Closest hit over tables larger than one kernel's VMEM capacity:
    Morton-sort each oversized table once, slice into spatially-compact
    slabs (SPH_SLAB spheres / TRI_SLAB triangles), and run the kernel per
    slab with the running best_t CHAINED as the next slab's t_max — near
    slabs shrink best_t so far slabs cull almost everything (the dense
    kernel's answer to bvh.rs:60-101 beyond VMEM capacity; the XLA
    fallbacks took minutes and killed the device at 160k spheres).

    Sub-scene sequence: [spheres slab 0 + rects + tris slab 0], then the
    remaining sphere slabs (empty rect/tri), then the remaining tri slabs
    (empty sphere/rect). The remaining slabs run as ``lax.scan`` over
    STACKED equal-shape slab tables, so the Mosaic kernel compiles at most
    three times (mixed slab 0, sphere-only, tri-only) no matter how many
    slabs the scene needs — the unrolled chain compiled one kernel instance
    PER slab, and a 4-slab first compile ran long enough to wedge the
    device tunnel when killed."""
    s = scene.spheres
    tr = scene.triangles
    n_s = s.radius.shape[0]
    n_t = tr.mat_id.shape[0]
    per_sph_vel = s.velocity.shape[0] == n_s
    empty_sph = type(s)(*([a[:0] for a in s[:4]] + [s.motion_marker]))
    empty_rects = type(scene.rects)(*[a[:0] for a in scene.rects])
    empty_tris = type(tr)(*[a[:0] for a in tr])

    s_order = (_morton_order(s.center.astype(jnp.float32)) if n_s > SPH_SLAB
               else jnp.arange(n_s, dtype=jnp.int32))
    t_order = (_morton_order(
        (tr.v0 + (tr.e1 + tr.e2) / 3.0).astype(jnp.float32))
        if n_t > TRI_SLAB else jnp.arange(n_t, dtype=jnp.int32))

    n = o.shape[0]
    tmax_cur = jnp.broadcast_to(
        jnp.minimum(jnp.asarray(t_max, jnp.float32), BIG), (n,))

    # slab 0: spheres slab 0 + ALL rects + tris slab 0, one mixed kernel
    idx_s0 = s_order[:SPH_SLAB]
    idx_t0 = t_order[:TRI_SLAB]

    def sph_slab(idx):
        return s._replace(
            center=s.center[idx], radius=s.radius[idx], mat_id=s.mat_id[idx],
            velocity=(s.velocity[idx] if per_sph_vel else s.velocity))

    sub0 = scene._replace(
        spheres=sph_slab(idx_s0) if n_s else s,
        triangles=(type(tr)(*[a[idx_t0] for a in tr]) if n_t else tr))
    t_i, ty_i, ix_i, data_i = _run(sub0, o, d, t_min, tmax_cur, alive,
                                   time=time)
    for prim, idx in ((PRIM_SPHERE, idx_s0 if n_s else None),
                      (PRIM_TRIANGLE, idx_t0 if n_t else None)):
        if idx is None or not idx.shape[0]:
            continue
        ix_i, data_i = _remap_winner_ids(ty_i, ix_i, data_i, prim, idx)
    best = (t_i, ty_i, ix_i, data_i)
    tmax_cur = jnp.minimum(tmax_cur,
                           jnp.where(jnp.isfinite(best[0]), best[0], BIG))

    # remaining sphere slabs: ONE scanned kernel over (K, SPH_SLAB) tables
    sph_ids = _slab_id_rows(s_order, n_s, SPH_SLAB)
    if sph_ids is not None:
        xs = (sph_ids, s.center[sph_ids], s.radius[sph_ids],
              s.mat_id[sph_ids],
              s.velocity[sph_ids] if per_sph_vel else None)

        def sph_body(carry, x):
            tmax_c, *b = carry
            ids, ctr, rad, mid, vel = x
            sub = scene._replace(
                spheres=type(s)(ctr, rad, mid,
                                vel if per_sph_vel else s.velocity,
                                s.motion_marker),
                rects=empty_rects, triangles=empty_tris)
            t_j, ty_j, ix_j, data_j = _run(sub, o, d, t_min, tmax_c, alive,
                                           time=time)
            ix_j, data_j = _remap_winner_ids(ty_j, ix_j, data_j,
                                             PRIM_SPHERE, ids)
            b, tmax_c = _fold_slab(tuple(b), tmax_c, t_j, ty_j, ix_j, data_j)
            return (tmax_c,) + b, None

        carry, _ = jax.lax.scan(sph_body, (tmax_cur,) + best, xs)
        tmax_cur, best = carry[0], tuple(carry[1:])

    # remaining tri slabs: ONE scanned kernel over (K, TRI_SLAB) tables
    tri_ids = _slab_id_rows(t_order, n_t, TRI_SLAB)
    if tri_ids is not None:
        xs = (tri_ids, type(tr)(*[a[tri_ids] for a in tr]))

        def tri_body(carry, x):
            tmax_c, *b = carry
            ids, tri_tbl = x
            sub = scene._replace(spheres=empty_sph, rects=empty_rects,
                                 triangles=tri_tbl)
            t_j, ty_j, ix_j, data_j = _run(sub, o, d, t_min, tmax_c, alive,
                                           time=time)
            ix_j, data_j = _remap_winner_ids(ty_j, ix_j, data_j,
                                             PRIM_TRIANGLE, ids)
            b, tmax_c = _fold_slab(tuple(b), tmax_c, t_j, ty_j, ix_j, data_j)
            return (tmax_c,) + b, None

        carry, _ = jax.lax.scan(tri_body, (tmax_cur,) + best, xs)
        tmax_cur, best = carry[0], tuple(carry[1:])
    return best


def _run(scene: Scene, o, d, t_min, t_max, alive=None, time=None):
    global _last_order_stats
    motion = bool(scene.spheres.motion_marker.shape[0]) and time is not None
    n = o.shape[0]
    time = (jnp.broadcast_to(jnp.asarray(time, jnp.float32), (n,))
            if motion else None)
    if (scene.spheres.radius.shape[0] > SPH_SLAB
            or scene.triangles.mat_id.shape[0] > TRI_SLAB):
        return _run_slabbed(scene, o, d, t_min, t_max, alive, time=time)
    sph, rect, tri, cull, tcull, scull, tscull = pack_tables(
        scene, with_motion=motion)
    tmin = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    tmax = jnp.broadcast_to(
        jnp.minimum(jnp.asarray(t_max, jnp.float32), BIG), (n,))
    if alive is None:
        alive = jnp.ones((n,), jnp.float32)
    interpret = jax.default_backend() != "tpu"
    # empty tables are padded to one dummy always-miss chunk; skip their
    # stages entirely (a dummy chunk costs as much as a real one)
    t, ty, ix, data, stats = _call_kernel(
        o, d, tmin, tmax, alive, sph, rect, tri, cull, tcull, scull, tscull,
        n_sph=sph.shape[0] if scene.spheres.radius.shape[0] else 0,
        n_rect=rect.shape[0] if scene.rects.k.shape[0] else 0,
        n_tri=tri.shape[0] if scene.triangles.mat_id.shape[0] else 0,
        interpret=interpret, time=time)
    if stats is not None:
        _last_order_stats = stats
    if motion:
        # fold the winner's extracted velocity (slots 4..6) into its center
        # slots: every downstream attrs consumer then sees the EFFECTIVE
        # center c + v*t without knowing about motion at all
        is_s = (ty == PRIM_SPHERE)[None, :]
        data = data.at[0:3].add(
            jnp.where(is_s, data[4:7] * time[None, :], 0.0))
    return t, ty, ix, data


def intersect_pallas(scene: Scene, o, d, t_min, t_max, alive=None,
                     time=None) -> Hit:
    """Closest hit via the fused VMEM-resident kernel. ``time`` (N,)
    enables motion blur on moving-sphere scenes (c + v*t, ray.rs has no
    time — extension)."""
    t, ty, ix, _ = _run(scene, o, d, t_min, t_max, alive, time=time)
    return Hit(t, ty, ix)


def attrs_from_winner_data(o, d, hit: Hit, data):
    """HitRecord fields + material features from the kernel's extracted
    winner parameters (``data``: (N_SLOTS, N) component ROWS) — zero table
    gathers (hit.rs:24-30 front-face logic; per-type normal/uv).
    Returns (HitAttrs, MatFeatures)."""
    from raytracer_tpu.ops.materials import MatFeatures
    valid = jnp.isfinite(hit.t)
    t = jnp.where(valid, hit.t, 0.0)
    p = o + t[:, None] * d
    ty = hit.prim_type

    # sphere: slots [cx, cy, cz, csq = |c|^2 - r^2]; slot 15 = exact r^2 on
    # the dense path (0 from leaf winners -> csq-expansion fallback)
    c = data[0:3].T
    rsq_slot = data[SPH_RSQ_SLOT]
    r = jnp.sqrt(jnp.maximum(
        jnp.where(rsq_slot > 0.0, rsq_slot,
                  jnp.sum(c * c, -1) - data[3]), 1e-20))
    sph_n = (p - c) / r[:, None]

    # rect: slots [n(3), a_hot(3), b_hot(3), k, a0, a1, b0, b1]
    rect_n = data[0:3].T
    pa = jnp.sum(p * data[3:6].T, -1)
    pb = jnp.sum(p * data[6:9].T, -1)
    a0, a1 = data[10], data[11]
    b0, b1 = data[12], data[13]
    rect_uv = jnp.stack([(pa - a0) / jnp.where(a1 != a0, a1 - a0, 1.0),
                         (pb - b0) / jnp.where(b1 != b0, b1 - b0, 1.0)], -1)

    # triangle: slots [b1, b2, n0(3), n1(3), n2(3)]
    tb1 = data[0][:, None]
    tb2 = data[1][:, None]
    tb0 = 1.0 - tb1 - tb2
    tri_n = vec.unit(tb0 * data[2:5].T + tb1 * data[5:8].T
                     + tb2 * data[8:11].T)

    is_s = (ty == PRIM_SPHERE)[:, None]
    is_r = (ty == PRIM_RECT)[:, None]
    n_out = jnp.where(is_s, sph_n, jnp.where(is_r, rect_n, tri_n))
    uv = jnp.where(is_s, sphere_uv(sph_n),
                   jnp.where(is_r, rect_uv, jnp.zeros_like(rect_uv)))
    fb = N_GEO_SLOTS  # feature slot base
    mat_id = jnp.round(data[fb + 11]).astype(jnp.int32)
    mat_id = jnp.where(valid, mat_id, 0)
    feats = MatFeatures(
        kind=jnp.round(data[fb + 0]).astype(jnp.int32),
        fuzz=data[fb + 1], ir=jnp.maximum(data[fb + 2], 1e-6),
        tex_kind=jnp.round(data[fb + 3]).astype(jnp.int32),
        color0=data[fb + 4:fb + 7].T, color1=data[fb + 7:fb + 10].T,
        image_id=jnp.round(data[fb + 10]).astype(jnp.int32),
        tex_id=jnp.zeros_like(mat_id))

    front_face = vec.dot(d, n_out) < 0.0
    normal = vec.unit(jnp.where(front_face[:, None], n_out, -n_out))
    return HitAttrs(valid, hit.t, p, normal, front_face, uv, mat_id), feats


def intersect_pallas_full(scene: Scene, o, d, t_min, t_max, alive=None,
                          time=None):
    """One fused call: (Hit, HitAttrs, MatFeatures) — no table access in
    the shading pass at all. With ``time``, moving-sphere winners arrive
    with EFFECTIVE centers already folded in (_run), so the attrs math is
    motion-agnostic."""
    t, ty, ix, data = _run(scene, o, d, t_min, t_max, alive, time=time)
    hit = Hit(t, ty, ix)
    attrs, feats = attrs_from_winner_data(o, d, hit, data)
    return hit, attrs, feats



# ------------------------------------------------- fused bounce megakernel

PI = 3.141592653589793
TWO_PI = 6.283185307179586
FRAC_1_PI = 0.3183098861837907


def _order_flags(*, n_sph, n_tri, sph_chunk, tri_chunk, cull, scull,
                 tcull, tscull, n_tiles):
    """Static qualification of each big stage for the per-tile ordered
    walk (shared by the closest-hit and fused-bounce call wrappers). SMEM
    budget: when both walks together overflow, keep whichever fits alone
    (spheres preferred — usually the bigger win); drop both only when
    neither fits."""
    k_ch = cull.shape[1]
    k_sup = k_ch // SUPER
    tk_ch = tcull.shape[1]
    tk_sup = tk_ch // SUPER
    sph_ord = (n_sph > 0 and k_ch >= ORDER_MIN_CHUNKS
               and k_ch % SUPER == 0 and k_sup <= ORDER_MAX_CHUNKS
               and n_sph == k_ch * sph_chunk
               and scull.shape[1] == k_sup)
    tri_ord = (n_tri > 0 and tk_ch >= ORDER_MIN_CHUNKS
               and tk_ch % SUPER == 0 and tk_sup <= ORDER_MAX_CHUNKS
               and n_tri == tk_ch * tri_chunk
               and tscull.shape[1] == tk_sup)
    sph_words = -(-k_sup // 4) if sph_ord else 0
    tri_words = -(-tk_sup // 4) if tri_ord else 0
    if n_tiles * (sph_words + tri_words) * 4 > ORDER_SMEM_BUDGET:
        if sph_ord and n_tiles * sph_words * 4 <= ORDER_SMEM_BUDGET:
            tri_ord = False
        elif tri_ord and n_tiles * tri_words * 4 <= ORDER_SMEM_BUDGET:
            sph_ord = False
        else:
            sph_ord = tri_ord = False
    return sph_ord, tri_ord


def _build_order_operands(o_t, alive, cull, scull, tcull, tscull, *,
                          sph_ord, tri_ord, sph_chunk, tri_chunk, tile):
    """Per-tile walk orders + flattened cull tables for the scalar-prefetch
    operands (shared by both ordered call wrappers). Returns
    (words (W,), cullf (F,), sph_cfg, tri_cfg)."""
    words_parts, cull_parts = [], []
    sph_cfg = tri_cfg = None
    word_base = cull_base = 0
    if sph_ord:
        k_ch = cull.shape[1]
        words, w_words = _tile_chunk_order(o_t, alive, scull, tile)
        sph_cfg = (w_words, k_ch, sph_chunk, 0, 0)
        words_parts.append(words)
        cull_parts += [cull.reshape(-1), scull.reshape(-1)]
        word_base = words.shape[0]
        cull_base = 6 * (k_ch + scull.shape[1])
    if tri_ord:
        tk_ch = tcull.shape[1]
        twords, tw_words = _tile_chunk_order(o_t, alive, tscull, tile)
        tri_cfg = (tw_words, tk_ch, tri_chunk, word_base, cull_base)
        words_parts.append(twords)
        cull_parts += [tcull.reshape(-1), tscull.reshape(-1)]
    return (jnp.concatenate(words_parts), jnp.concatenate(cull_parts),
            sph_cfg, tri_cfg)


def _bounce_values(rv: RayVals, carry, uni_ref):
    """In-VMEM hit attributes + texture + scatter on the folded winner —
    the (1,T)-ROW twin of wavefront_soa.attrs_soa + scatter_soa
    (hit.rs:24-30, material.rs:92-212). Round 3 built this epilogue on
    (TILE,1) columns and measured it OUT (~200 ops at 1/128 lane
    utilization ~ +31 ms/step at 960k lanes); on rows the same ~200 ops
    cost TILE/128 = 2 vregs each (~16x less), which is why the fused
    bounce is now the default path (see wavefront_soa.use_fused).

    The scatter uniforms arrive in ``uni_ref`` rows 0-2 (the SAME rows
    of the per-step batched draw that scatter_soa consumes, so results
    are stream-identical to the unfused path); row 3 carries spawn_eps.
    Image/noise textures need HBM gathers and are excluded by the
    wrapper's eligibility check (constant/checker only). Motion scenes:
    the winner's velocity sits in slots 4..6 and folds into the sphere
    center candidates here (c + v*t), mirroring _run's post-kernel fold."""
    best_t, best_ty, best_ix, data = carry
    del best_ix
    col = lambda i: data[i:i + 1, :]
    valid = best_ty >= 0.0
    t = jnp.where(valid, best_t, 0.0)
    px = rv.ox + t * rv.dx
    py = rv.oy + t * rv.dy
    pz = rv.oz + t * rv.dz

    def unit3(x, y, z):
        inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
        return x * inv, y * inv, z * inv

    # sphere normal: slots [cx, cy, cz, csq]; slot 15 = exact r^2; motion
    # winners carry velocity in slots 4..6 (zeros on static tables). The
    # velocity fold only feeds the SPHERE normal candidate, which rect/tri
    # winners discard in the select below.
    cx, cy, cz = col(0), col(1), col(2)
    if rv.time is not None:
        cx = cx + col(4) * rv.time
        cy = cy + col(5) * rv.time
        cz = cz + col(6) * rv.time
    rsq_slot = col(SPH_RSQ_SLOT)
    r = jnp.sqrt(jnp.maximum(
        jnp.where(rsq_slot > 0.0, rsq_slot,
                  cx * cx + cy * cy + cz * cz - col(3)), 1e-20))
    inv_r = 1.0 / r
    snx, sny, snz = (px - cx) * inv_r, (py - cy) * inv_r, (pz - cz) * inv_r
    # triangle smooth normal: slots [b1, b2, n0(3), n1(3), n2(3)]
    tb1, tb2 = col(0), col(1)
    tb0 = 1.0 - tb1 - tb2
    tnx = tb0 * col(2) + tb1 * col(5) + tb2 * col(8)
    tny = tb0 * col(3) + tb1 * col(6) + tb2 * col(9)
    tnz = tb0 * col(4) + tb1 * col(7) + tb2 * col(10)
    tnx, tny, tnz = unit3(tnx, tny, tnz)
    is_s = best_ty == float(PRIM_SPHERE)
    is_r = best_ty == float(PRIM_RECT)
    # rect normal IS slots 0..2, same as the sphere center slots
    nox = jnp.where(is_s, snx, jnp.where(is_r, col(0), tnx))
    noy = jnp.where(is_s, sny, jnp.where(is_r, col(1), tny))
    noz = jnp.where(is_s, snz, jnp.where(is_r, col(2), tnz))
    front = (rv.dx * nox + rv.dy * noy + rv.dz * noz) < 0.0
    sgn = jnp.where(front, 1.0, -1.0)
    nx, ny, nz = unit3(nox * sgn, noy * sgn, noz * sgn)

    fb = N_GEO_SLOTS
    kind = col(fb + 0)
    fuzz = col(fb + 1)
    ir = jnp.maximum(col(fb + 2), 1e-6)
    tex_kind = col(fb + 3)
    # texture: constant/checker (material.rs:52-68; checker is world-space)
    sines = jnp.sin(10.0 * px) * jnp.sin(10.0 * py) * jnp.sin(10.0 * pz)
    chk = (jnp.abs(tex_kind - float(TEX_CHECKER)) < 0.5) & (sines >= 0.0)
    alr = jnp.where(chk, col(fb + 7), col(fb + 4))
    alg = jnp.where(chk, col(fb + 8), col(fb + 5))
    alb = jnp.where(chk, col(fb + 9), col(fb + 6))

    # scatter draws (scatter_soa stream order): u0,u1 = lambertian sphere;
    # u2,u3 = metal fuzz sphere; u4 = dielectric reflect choice
    u0 = uni_ref[0:1, :]
    u1 = uni_ref[1:2, :]
    u2 = uni_ref[2:3, :]
    eps = uni_ref[3:4, :]

    # ONE unit-sphere draw (rows 0-1) shared by the diffuse bounce and the
    # metal fuzz offset — material kinds are exclusive per lane (same
    # convention as scatter_soa / materials.scatter)
    z = 1.0 - 2.0 * u0
    phi = TWO_PI * u1
    rs = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    sx = rs * jnp.cos(phi)
    sy = rs * jnp.sin(phi)

    # Lambertian / DiffuseLight: n + unit_sphere, near-zero guard
    ldx = nx + sx
    ldy = ny + sy
    ldz = nz + z
    small = (ldx * ldx + ldy * ldy + ldz * ldz) < 1e-16
    ldx = jnp.where(small, nx, ldx)
    ldy = jnp.where(small, ny, ldy)
    ldz = jnp.where(small, nz, ldz)

    # Metal: reflect(unit_d) + fuzz * unit_sphere; absorb below surface
    ux, uy, uz = unit3(rv.dx, rv.dy, rv.dz)
    dn = ux * nx + uy * ny + uz * nz
    rfx = ux - 2.0 * dn * nx
    rfy = uy - 2.0 * dn * ny
    rfz = uz - 2.0 * dn * nz
    mdx = rfx + fuzz * sx
    mdy = rfy + fuzz * sy
    mdz = rfz + fuzz * z
    metal_ok = (mdx * nx + mdy * ny + mdz * nz) > 0.0

    # Dielectric: Schlick + TIR + stochastic reflect/refract
    ratio = jnp.where(front, 1.0 / ir, ir)
    cos_t = jnp.minimum(-(ux * nx + uy * ny + uz * nz), 1.0)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    cannot = ratio * sin_t > 1.0
    r0 = ((1.0 - ratio) / (1.0 + ratio)) ** 2
    refl = r0 + (1.0 - r0) * (1.0 - cos_t) ** 5
    do_refl = cannot | (refl > u2)
    ppx = ratio * (ux + cos_t * nx)
    ppy = ratio * (uy + cos_t * ny)
    ppz = ratio * (uz + cos_t * nz)
    par = -jnp.sqrt(jnp.abs(1.0 - (ppx * ppx + ppy * ppy + ppz * ppz)))
    ddx = jnp.where(do_refl, rfx, ppx + par * nx)
    ddy = jnp.where(do_refl, rfy, ppy + par * ny)
    ddz = jnp.where(do_refl, rfz, ppz + par * nz)

    is_lam = jnp.abs(kind - float(MAT_LAMBERTIAN)) < 0.5
    is_met = jnp.abs(kind - float(MAT_METAL)) < 0.5
    is_die = jnp.abs(kind - float(MAT_DIELECTRIC)) < 0.5
    is_lgt = jnp.abs(kind - float(MAT_DIFFUSE_LIGHT)) < 0.5
    diffish = is_lam | is_lgt

    odx = jnp.where(diffish, ldx, jnp.where(is_met, mdx, ddx))
    ody = jnp.where(diffish, ldy, jnp.where(is_met, mdy, ddy))
    odz = jnp.where(diffish, ldz, jnp.where(is_met, mdz, ddz))
    ar = jnp.where(is_lgt, FRAC_1_PI, alr)
    ag = jnp.where(is_lgt, FRAC_1_PI, alg)
    ab = jnp.where(is_lgt, FRAC_1_PI, alb)
    inter = jnp.where(
        diffish, float(INTER_DIFFUSE),
        jnp.where(is_met,
                  jnp.where(metal_ok, float(INTER_SPECULAR),
                            float(INTER_ABSORB)),
                  jnp.where(is_die,
                            jnp.where(do_refl, float(INTER_REFLECT),
                                      float(INTER_REFRACT)),
                            float(INTER_DIFFUSE))))
    inter = jnp.where(valid, inter, float(INTER_ABSORB))
    lit = is_lgt & valid
    er = jnp.where(lit, alr, 0.0)
    eg = jnp.where(lit, alg, 0.0)
    eb = jnp.where(lit, alb, 0.0)

    side = jnp.sign(odx * nx + ody * ny + odz * nz) * eps
    return (inter, px + nx * side, py + ny * side, pz + nz * side,
            odx, ody, odz, ar, ag, ab, er, eg, eb, px, py, pz, nx, ny, nz)


def _bounce_epilogue(rv: RayVals, carry, uni_ref, no_ref, nd_ref, att_ref,
                     emit_ref, p_ref, n_ref, inter_ref):
    """_bounce_values + ref writes (the plain fused-bounce kernel body)."""
    (inter, nox_, noy_, noz_, odx, ody, odz, ar, ag, ab, er, eg, eb,
     px, py, pz, nx, ny, nz) = _bounce_values(rv, carry, uni_ref)
    no_ref[:] = jnp.concatenate([nox_, noy_, noz_], axis=0)
    nd_ref[:] = jnp.concatenate([odx, ody, odz], axis=0)
    att_ref[:] = jnp.concatenate([ar, ag, ab], axis=0)
    emit_ref[:] = jnp.concatenate([er, eg, eb], axis=0)
    p_ref[:] = jnp.concatenate([px, py, pz], axis=0)
    n_ref[:] = jnp.concatenate([nx, ny, nz], axis=0)
    inter_ref[:] = inter.astype(jnp.int32)


def _bounce_kernel(o_ref, d_ref, tmin_ref, alive_ref, uni_ref, *refs,
                   n_sph: int, n_rect: int, n_tri: int,
                   has_time: bool = False):
    """One full bounce per call: closest hit over all tables + attrs +
    texture + scatter, all in VMEM. Removes the per-bounce XLA stage
    (attrs_soa + scatter_soa + the winner-data round trip) that cost a
    measured ~8.3 ms/step at 960k lanes (experiments/step_profile.py)."""
    time_ref, refs = (refs[0], refs[1:]) if has_time else (None, refs)
    (sph_ref, rect_ref, tri_ref, cull_ref, tcull_ref, scull_ref,
     no_ref, nd_ref, att_ref, emit_ref, p_ref, n_ref, inter_ref) = refs
    rv = ray_vals(o_ref, d_ref, tmin_ref, tmin_ref, time_ref)
    rv = rv._replace(tmax=jnp.full_like(rv.tmin, BIG))
    carry, _, _ = _stage_sweep(rv, alive_ref[:], sph_ref, rect_ref, tri_ref,
                               cull_ref, tcull_ref, scull_ref, n_sph=n_sph,
                               n_rect=n_rect, n_tri=n_tri)
    _bounce_epilogue(rv, carry, uni_ref, no_ref, nd_ref, att_ref, emit_ref,
                     p_ref, n_ref, inter_ref)


def _bounce_kernel_ordered(order_ref, cullf_ref, o_ref, d_ref, tmin_ref,
                           alive_ref, uni_ref, *refs, n_sph: int,
                           n_rect: int, n_tri: int, sph_cfg, tri_cfg,
                           has_time: bool = False):
    """Ordered-walk twin of _bounce_kernel (see _stage_sweep)."""
    time_ref, refs = (refs[0], refs[1:]) if has_time else (None, refs)
    (sph_ref, rect_ref, tri_ref, cull_ref, tcull_ref, scull_ref,
     no_ref, nd_ref, att_ref, emit_ref, p_ref, n_ref, inter_ref) = refs
    rv = ray_vals(o_ref, d_ref, tmin_ref, tmin_ref, time_ref)
    rv = rv._replace(tmax=jnp.full_like(rv.tmin, BIG))
    carry, _, _ = _stage_sweep(
        rv, alive_ref[:], sph_ref, rect_ref, tri_ref, cull_ref, tcull_ref,
        scull_ref, n_sph=n_sph, n_rect=n_rect, n_tri=n_tri,
        order_ref=order_ref, cullf_ref=cullf_ref, sph_cfg=sph_cfg,
        tri_cfg=tri_cfg)
    _bounce_epilogue(rv, carry, uni_ref, no_ref, nd_ref, att_ref, emit_ref,
                     p_ref, n_ref, inter_ref)


_BOUNCE_OUT_WIDTHS = (3, 3, 3, 3, 3, 3, 1)   # no, nd, att, emit, p, n, inter


# --------------------------------------------------------------------------
# Megakernel v2: the ENTIRE regen-loop body in one pallas call. On top of
# the fused bounce (intersect + attrs + texture + scatter), the kernel also
# runs the per-step bookkeeping the XLA side used to do — emission
# accumulation, throughput update, Russian roulette, retire/quota
# accounting, and the camera-ray respawn of retired lanes — so the
# while_loop body outside reduces to one uniform draw + this call.
# Measured motivation (experiments/step_profile.py, 480k lanes, v5e): the
# XLA bookkeeping cost ~2.0 ms of the 7.36 ms step.
#
# uni2 rows: 0 sph1, 1 sph2, 2 diel (the scatter rows _bounce_values
# reads), 3 spawn_eps, 4 RR, 5 jitter-x, 6 jitter-y, 7 lens-r, 8 lens-phi,
# 9 shutter-time (motion only). cam is a (32, 1) VMEM column: [0:3 origin,
# 3:6 u, 6:9 v, 9:12 lower_left, 12:15 horizontal, 15:18 vertical,
# 18 lens_radius, 19 time0, 20 time1].

def _regen_epilogue(rv: RayVals, carry, uni_ref, cam_ref, px_ref, py_ref,
                    tput_ref, samp_ref, accum_ref, depth_ref, done_ref,
                    alive_vec, time_ref, o_out, d_out, tput_out, samp_out,
                    accum_out, alive_out, depth_out, done_out, time_out, *,
                    width: int, height: int, quota: int, max_depth: int,
                    rr_on: bool, rr_start: int):
    (inter, nox_, noy_, noz_, odx, ody, odz, ar, ag, ab, er, eg, eb,
     _px, _py, _pz, _nx, _ny, _nz) = _bounce_values(rv, carry, uni_ref)
    row = lambda ref, i: ref[i:i + 1, :]
    a = alive_vec > 0.0
    tr, tg, tb = row(tput_ref, 0), row(tput_ref, 1), row(tput_ref, 2)
    sr, sg, sb = row(samp_ref, 0), row(samp_ref, 1), row(samp_ref, 2)
    acr, acg, acb = row(accum_ref, 0), row(accum_ref, 1), row(accum_ref, 2)
    depth = depth_ref[:]
    done = done_ref[:]

    # emission (non-NEE regen loop: emit_ok == alive; er is miss-masked)
    sr = sr + jnp.where(a, tr * er, 0.0)
    sg = sg + jnp.where(a, tg * eg, 0.0)
    sb = sb + jnp.where(a, tb * eb, 0.0)

    cont = a & (inter != float(INTER_ABSORB))
    tr2 = jnp.where(cont, tr * ar, tr)
    tg2 = jnp.where(cont, tg * ag, tg)
    tb2 = jnp.where(cont, tb * ab, tb)
    if rr_on:
        p_surv = jnp.clip(jnp.maximum(tr2, jnp.maximum(tg2, tb2)),
                          0.05, 1.0)
        do_rr = depth >= float(rr_start)
        survive = (~do_rr) | (row(uni_ref, 4) < p_surv)
        scale = jnp.where(do_rr & cont & survive, 1.0 / p_surv, 1.0)
        tr2, tg2, tb2 = tr2 * scale, tg2 * scale, tb2 * scale
        cont = cont & survive
    depth2 = depth + 1.0
    cont = cont & (depth2 < float(max_depth))

    retire = a & ~cont
    acr = acr + jnp.where(retire, sr, 0.0)
    acg = acg + jnp.where(retire, sg, 0.0)
    acb = acb + jnp.where(retire, sb, 0.0)
    done2 = done + jnp.where(retire, 1.0, 0.0)
    regen = retire & (done2 < float(quota))

    # camera respawn of regen lanes (camera_rays_soa row twin,
    # camera.rs:57-64 + the jitter/y-flip of camera.rs:97-99)
    c = lambda i: cam_ref[i, 0]
    cu = (px_ref[:] + row(uni_ref, 5)) / float(width - 1)
    cv = (py_ref[:] + row(uni_ref, 6)) / float(height - 1)
    ct = 1.0 - cv
    lr = jnp.sqrt(row(uni_ref, 7)) * c(18)
    phi = TWO_PI * row(uni_ref, 8)
    rdx = lr * jnp.cos(phi)
    rdy = lr * jnp.sin(phi)
    cox = c(0) + c(3) * rdx + c(6) * rdy
    coy = c(1) + c(4) * rdx + c(7) * rdy
    coz = c(2) + c(5) * rdx + c(8) * rdy
    cdx = c(9) + cu * c(12) + ct * c(15) - cox
    cdy = c(10) + cu * c(13) + ct * c(16) - coy
    cdz = c(11) + cu * c(14) + ct * c(17) - coz

    sel = lambda cam, nxt, old: jnp.where(
        regen, cam, jnp.where(cont, nxt, old))
    o_out[:] = jnp.concatenate([sel(cox, nox_, rv.ox),
                                sel(coy, noy_, rv.oy),
                                sel(coz, noz_, rv.oz)], axis=0)
    d_out[:] = jnp.concatenate([sel(cdx, odx, rv.dx),
                                sel(cdy, ody, rv.dy),
                                sel(cdz, odz, rv.dz)], axis=0)
    one = jnp.ones_like(tr2)
    zero = jnp.zeros_like(tr2)
    tput_out[:] = jnp.concatenate([jnp.where(regen, one, tr2),
                                   jnp.where(regen, one, tg2),
                                   jnp.where(regen, one, tb2)], axis=0)
    samp_out[:] = jnp.concatenate([jnp.where(regen, zero, sr),
                                   jnp.where(regen, zero, sg),
                                   jnp.where(regen, zero, sb)], axis=0)
    accum_out[:] = jnp.concatenate([acr, acg, acb], axis=0)
    alive_out[:] = (cont | regen).astype(jnp.float32)
    depth_out[:] = jnp.where(regen, 0.0, depth2)
    done_out[:] = done2
    if time_out is not None:
        t_new = c(19) + row(uni_ref, 9) * (c(20) - c(19))
        time_out[:] = jnp.where(regen, t_new, time_ref[:])


def _regen_kernel(o_ref, d_ref, tmin_ref, alive_ref, uni_ref, *refs,
                  n_sph: int, n_rect: int, n_tri: int, width: int,
                  height: int, quota: int, max_depth: int, rr_on: bool,
                  rr_start: int, has_time: bool = False,
                  order: bool = False, sph_cfg=None, tri_cfg=None,
                  order_ref=None, cullf_ref=None):
    time_ref, refs = (refs[0], refs[1:]) if has_time else (None, refs)
    (px_ref, py_ref, tput_ref, samp_ref, accum_ref, depth_ref, done_ref,
     cam_ref, sph_ref, rect_ref, tri_ref, cull_ref, tcull_ref, scull_ref,
     o_out, d_out, tput_out, samp_out, accum_out, alive_out, depth_out,
     done_out, *rest) = refs
    time_out = rest[0] if has_time else None
    rv = ray_vals(o_ref, d_ref, tmin_ref, tmin_ref, time_ref)
    rv = rv._replace(tmax=jnp.full_like(rv.tmin, BIG))
    alive_vec = alive_ref[:]
    if order:
        carry, _, _ = _stage_sweep(
            rv, alive_vec, sph_ref, rect_ref, tri_ref, cull_ref, tcull_ref,
            scull_ref, n_sph=n_sph, n_rect=n_rect, n_tri=n_tri,
            order_ref=order_ref, cullf_ref=cullf_ref, sph_cfg=sph_cfg,
            tri_cfg=tri_cfg)
    else:
        carry, _, _ = _stage_sweep(
            rv, alive_vec, sph_ref, rect_ref, tri_ref, cull_ref, tcull_ref,
            scull_ref, n_sph=n_sph, n_rect=n_rect, n_tri=n_tri)
    _regen_epilogue(rv, carry, uni_ref, cam_ref, px_ref, py_ref, tput_ref,
                    samp_ref, accum_ref, depth_ref, done_ref, alive_vec,
                    time_ref, o_out, d_out, tput_out, samp_out, accum_out,
                    alive_out, depth_out, done_out, time_out, width=width,
                    height=height, quota=quota, max_depth=max_depth,
                    rr_on=rr_on, rr_start=rr_start)


def _regen_kernel_ordered(order_ref, cullf_ref, o_ref, d_ref, tmin_ref,
                          alive_ref, uni_ref, *refs, **kw):
    _regen_kernel(o_ref, d_ref, tmin_ref, alive_ref, uni_ref, *refs,
                  order=True, order_ref=order_ref, cullf_ref=cullf_ref,
                  **kw)


_REGEN_OUT_WIDTHS = (3, 3, 3, 3, 3, 1, 1, 1)  # o d tput samp accum al dep dn


@functools.partial(jax.jit, static_argnames=(
    "n_sph", "n_rect", "n_tri", "interpret", "width", "height", "quota",
    "max_depth", "rr_on", "rr_start"))
def _call_regen(o_t, d_t, tmin, alive, uni_t, px, py, tput, samp, accum,
                depth, done, cam, sph, rect, tri, cull, tcull, scull,
                tscull, *, n_sph, n_rect, n_tri, interpret, width, height,
                quota, max_depth, rr_on, rr_start, time=None):
    """Megakernel-v2 pallas call: one full regen-loop step. All ray
    operands transposed ((w, N) rows); ``cam`` is the (32, 1) camera
    column. Returns (o (3,N), d (3,N), tput (3,N), samp (3,N),
    accum (3,N), alive (1,N) f32, depth (1,N), done (1,N) [, time])."""
    n = o_t.shape[1]
    tile = tile_for(n_tri)
    n_pad = -(-n // tile) * tile
    pad = n_pad - n
    if pad:
        o_t = jnp.pad(o_t, [(0, 0), (0, pad)])
        d_t = jnp.pad(d_t, [(0, 0), (0, pad)])
        tmin = jnp.pad(tmin, [(0, pad)])
        alive = jnp.pad(alive, [(0, pad)])      # pad lanes stay dead: every
        uni_t = jnp.pad(uni_t, [(0, 0), (0, pad)])  # gate below flows from a
        px = jnp.pad(px, [(0, pad)])
        py = jnp.pad(py, [(0, pad)])
        tput = jnp.pad(tput, [(0, 0), (0, pad)])
        samp = jnp.pad(samp, [(0, 0), (0, pad)])
        accum = jnp.pad(accum, [(0, 0), (0, pad)])
        depth = jnp.pad(depth, [(0, pad)])
        done = jnp.pad(done, [(0, pad)])
        if time is not None:
            time = jnp.pad(time, [(0, pad)])
    alive = alive.astype(jnp.float32)

    sph_chunk = eff_chunk(n_sph, SPH_CHUNK) if n_sph else SPH_CHUNK
    tri_chunk = eff_chunk(n_tri, CHUNK) if n_tri else CHUNK
    n_tiles = n_pad // tile
    sph_ord, tri_ord = _order_flags(
        n_sph=n_sph, n_tri=n_tri, sph_chunk=sph_chunk, tri_chunk=tri_chunk,
        cull=cull, scull=scull, tcull=tcull, tscull=tscull, n_tiles=n_tiles)

    ray_ins = [o_t, d_t, tmin[None], alive[None], uni_t]
    ray_widths = [3, 3, 1, 1, uni_t.shape[0]]
    if time is not None:
        ray_ins.append(time[None])
        ray_widths.append(1)
    ray_ins += [px[None], py[None], tput, samp, accum, depth[None],
                done[None]]
    ray_widths += [1, 1, 3, 3, 3, 1, 1]
    grid = (n_pad // tile,)
    flops_per_ray = 40 * n_sph + 60 * n_rect + 80 * n_tri + 500
    out_widths = _REGEN_OUT_WIDTHS + ((1,) if time is not None else ())
    out_shape = [jax.ShapeDtypeStruct((w, n_pad), jnp.float32)
                 for w in out_widths]
    cost = pl.CostEstimate(
        flops=flops_per_ray * n_pad, bytes_accessed=n_pad * 260,
        transcendentals=n_pad * max(1, n_sph))
    kern_kw = dict(n_sph=n_sph, n_rect=n_rect, n_tri=n_tri, width=width,
                   height=height, quota=quota, max_depth=max_depth,
                   rr_on=rr_on, rr_start=rr_start,
                   has_time=time is not None)

    if sph_ord or tri_ord:
        words, cullf, sph_cfg, tri_cfg = _build_order_operands(
            o_t, alive, cull, scull, tcull, tscull, sph_ord=sph_ord,
            tri_ord=tri_ord, sph_chunk=sph_chunk, tri_chunk=tri_chunk,
            tile=tile)
        rs = lambda w: pl.BlockSpec((w, tile), lambda i, *_: (0, i),
                                    memory_space=pltpu.VMEM)
        kernel = functools.partial(_regen_kernel_ordered, sph_cfg=sph_cfg,
                                   tri_cfg=tri_cfg, **kern_kw)
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=[rs(w) for w in ray_widths]
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
                out_specs=[rs(w) for w in out_widths]),
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret,
        )(words, cullf, *ray_ins, cam, sph, rect, tri, cull, tcull, scull)
    else:
        rs = lambda w: pl.BlockSpec((w, tile), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)
        kernel = functools.partial(_regen_kernel, **kern_kw)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[rs(w) for w in ray_widths]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=[rs(w) for w in out_widths],
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret,
        )(*ray_ins, cam, sph, rect, tri, cull, tcull, scull)
    return tuple(x[:, :n] for x in outs)


def pack_camera(cam) -> jnp.ndarray:
    """Camera params as the (32, 1) f32 column _regen_epilogue reads."""
    parts = jnp.concatenate([
        cam.origin, cam.u, cam.v, cam.lower_left_corner, cam.horizontal,
        cam.vertical,
        jnp.reshape(cam.lens_radius.astype(jnp.float32), (1,)),
        jnp.reshape(jnp.asarray(cam.time0, jnp.float32), (1,)),
        jnp.reshape(jnp.asarray(cam.time1, jnp.float32), (1,))])
    return jnp.pad(parts, (0, 32 - parts.shape[0]))[:, None]


def regen_step_fused(scene: Scene, o_t, d_t, t_min, alive, uni2_t, px, py,
                     tput, samp, accum, depth, done, *, width, height,
                     quota, max_depth, rr_on, rr_start, time=None):
    """One fused regen-loop step (see _regen_epilogue docstring for the
    uni2 row layout). Wrapper mirroring bounce_fused's table packing."""
    motion = (bool(scene.spheres.motion_marker.shape[0])
              and time is not None)
    sph, rect, tri, cull, tcull, scull, tscull = pack_tables(
        scene, with_motion=motion)
    n = o_t.shape[1]
    tmin = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    time = (jnp.broadcast_to(jnp.asarray(time, jnp.float32), (n,))
            if motion else None)
    interpret = jax.default_backend() != "tpu"
    return _call_regen(
        o_t, d_t, tmin, alive, uni2_t, px, py, tput, samp, accum, depth,
        done, pack_camera(scene.camera), sph, rect, tri, cull, tcull,
        scull, tscull,
        n_sph=sph.shape[0] if scene.spheres.radius.shape[0] else 0,
        n_rect=rect.shape[0] if scene.rects.k.shape[0] else 0,
        n_tri=tri.shape[0] if scene.triangles.mat_id.shape[0] else 0,
        interpret=interpret, width=width, height=height, quota=quota,
        max_depth=max_depth, rr_on=rr_on, rr_start=rr_start, time=time)


@functools.partial(jax.jit, static_argnames=("n_sph", "n_rect", "n_tri",
                                             "interpret"))
def _call_bounce(o_t, d_t, tmin, alive, uni_t, sph, rect, tri, cull, tcull,
                 scull, tscull, *, n_sph, n_rect, n_tri, interpret,
                 time=None):
    """Fused-bounce pallas call. Transposed operands throughout: ``o_t``/
    ``d_t`` (3, N), ``uni_t`` (4, N); outputs (3, N) rows + (1, N) inter.
    Takes the same per-tile ordered walk as the closest-hit kernel when a
    stage qualifies (_order_flags)."""
    n = o_t.shape[1]
    tile = tile_for(n_tri)
    n_pad = -(-n // tile) * tile
    pad = n_pad - n
    if pad:
        o_t = jnp.pad(o_t, [(0, 0), (0, pad)])
        d_t = jnp.pad(d_t, [(0, 0), (0, pad)])  # zero dir -> all tests miss
        tmin = jnp.pad(tmin, [(0, pad)])
        alive = jnp.pad(alive, [(0, pad)])      # pad lanes are dead
        uni_t = jnp.pad(uni_t, [(0, 0), (0, pad)])
        if time is not None:
            time = jnp.pad(time, [(0, pad)])
    alive = alive.astype(jnp.float32)

    sph_chunk = eff_chunk(n_sph, SPH_CHUNK) if n_sph else SPH_CHUNK
    tri_chunk = eff_chunk(n_tri, CHUNK) if n_tri else CHUNK
    n_tiles = n_pad // tile
    sph_ord, tri_ord = _order_flags(
        n_sph=n_sph, n_tri=n_tri, sph_chunk=sph_chunk, tri_chunk=tri_chunk,
        cull=cull, scull=scull, tcull=tcull, tscull=tscull, n_tiles=n_tiles)

    ray_ins = [o_t, d_t, tmin[None], alive[None], uni_t]
    ray_widths = [3, 3, 1, 1, uni_t.shape[0]]
    if time is not None:
        ray_ins.append(time[None])
        ray_widths.append(1)
    grid = (n_pad // tile,)
    flops_per_ray = 40 * n_sph + 60 * n_rect + 80 * n_tri + 300
    out_shape = ([jax.ShapeDtypeStruct((3, n_pad), jnp.float32)] * 6
                 + [jax.ShapeDtypeStruct((1, n_pad), jnp.int32)])
    cost = pl.CostEstimate(
        flops=flops_per_ray * n_pad, bytes_accessed=n_pad * 160,
        transcendentals=n_pad * max(1, n_sph))

    if sph_ord or tri_ord:
        words, cullf, sph_cfg, tri_cfg = _build_order_operands(
            o_t, alive, cull, scull, tcull, tscull, sph_ord=sph_ord,
            tri_ord=tri_ord, sph_chunk=sph_chunk, tri_chunk=tri_chunk,
            tile=tile)
        rs = lambda w: pl.BlockSpec((w, tile), lambda i, *_: (0, i),
                                    memory_space=pltpu.VMEM)
        kernel = functools.partial(
            _bounce_kernel_ordered, n_sph=n_sph, n_rect=n_rect, n_tri=n_tri,
            sph_cfg=sph_cfg, tri_cfg=tri_cfg, has_time=time is not None)
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=[rs(w) for w in ray_widths]
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
                out_specs=[rs(w) for w in _BOUNCE_OUT_WIDTHS]),
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret,
        )(words, cullf, *ray_ins, sph, rect, tri, cull, tcull, scull)
    else:
        rs = lambda w: pl.BlockSpec((w, tile), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)
        kernel = functools.partial(_bounce_kernel, n_sph=n_sph,
                                   n_rect=n_rect, n_tri=n_tri,
                                   has_time=time is not None)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[rs(w) for w in ray_widths]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=[rs(w) for w in _BOUNCE_OUT_WIDTHS],
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret,
        )(*ray_ins, sph, rect, tri, cull, tcull, scull)
    return tuple(x[:, :n] for x in outs)


def bounce_fused_eligible(scene: Scene) -> bool:
    """The megakernel evaluates textures in VMEM: constant/checker only
    (image/noise need HBM gathers), and only a SINGLE-kernel table budget
    (it has no slab path — scenes beyond SPH_SLAB spheres must go through
    _run/_run_slabbed). Motion blur is fused-eligible since round 4 (the
    kernel threads per-ray time; the epilogue folds winner velocity)."""
    return (scene.images.shape[0] == 0
            and scene.textures.noise_marker.shape[0] == 0
            and (scene.media is None or scene.media.kind.shape[0] == 0)
            and scene.spheres.radius.shape[0] <= SPH_SLAB
            and scene.triangles.mat_id.shape[0] <= TRI_SLAB)


def bounce_fused(scene: Scene, o_t, d_t, t_min, alive, uni_t, time=None):
    """One fused bounce: intersect + attrs + texture + scatter in a single
    pallas call. TRANSPOSED interface (rays on the lane axis end to end):
    ``o_t``/``d_t`` are (3, N); ``uni_t`` is (4, N) — the three scatter
    uniforms (drawn with scatter_soa's exact threefry splits, see
    rows of the caller's per-step batched draw; wavefront_soa U_SPH1/
    U_SPH2/U_DIEL) plus spawn_eps in row 3. ``time``
    (N,) enables motion blur on moving-sphere scenes. Returns
    (inter (N,) i32, new_o (3,N), new_d (3,N), att (3,N), emit (3,N),
    p (3,N), n (3,N))."""
    motion = (bool(scene.spheres.motion_marker.shape[0])
              and time is not None)
    sph, rect, tri, cull, tcull, scull, tscull = pack_tables(
        scene, with_motion=motion)
    n = o_t.shape[1]
    tmin = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    time = (jnp.broadcast_to(jnp.asarray(time, jnp.float32), (n,))
            if motion else None)
    interpret = jax.default_backend() != "tpu"
    no, nd, att, emit, p, nrm, inter = _call_bounce(
        o_t, d_t, tmin, alive, uni_t, sph, rect, tri, cull, tcull, scull,
        tscull,
        n_sph=sph.shape[0] if scene.spheres.radius.shape[0] else 0,
        n_rect=rect.shape[0] if scene.rects.k.shape[0] else 0,
        n_tri=tri.shape[0] if scene.triangles.mat_id.shape[0] else 0,
        interpret=interpret, time=time)
    return inter[0], no, nd, att, emit, p, nrm
