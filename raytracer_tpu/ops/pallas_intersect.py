"""Pallas TPU kernel: closest hit over all primitive tables.

Why this kernel exists: the XLA brute-force path (ops/intersect.py)
materializes (N_rays, C) intermediates in HBM for every primitive chunk of
every bounce — the render is HBM-bandwidth-bound. This kernel tiles rays
(TILE=256) over a 1-D grid, holds ALL primitive tables resident in VMEM
(they are tiny: scene_500 is ~20 KB of spheres), and performs the whole
(TILE, CHUNK) intersection + reduction on-chip. HBM traffic per bounce drops
to the ray SoA itself (~28 B/ray), leaving the VPU as the limit.

Layout: tables are packed row-major "component planes" so every per-pair
term is a broadcast of a (TILE,1) ray column against a (1,C) table row —
pure VPU work; no (TILE,C,3) tensors anywhere.

- spheres  (4, S): cx, cy, cz, |c|^2 - r^2          (pad: row3 = +BIG)
- rects   (14, R): n_hot xyz, a_hot xyz, b_hot xyz, k, a0, a1, b0, b1
                                                     (pad: a0=1, a1=-1)
- tris    (16, T): n_geo xyz, e1 xyz, e2 xyz, e2xv0 xyz, e1xv0 xyz, v0.n
                                                     (pad: all zeros -> div=0)

Math matches ops/intersect.py exactly (sphere.rs:24-55, rectangle.rs,
mesh.rs:57-98 via the scalar-triple-product form). Falls back to interpret
mode off-TPU so tests exercise the same code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.ops.intersect import Hit
from raytracer_tpu.scene.types import (
    PRIM_RECT, PRIM_SPHERE, PRIM_TRIANGLE, Scene,
)

TILE = 256
CHUNK = 512
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


def pack_tables(scene: Scene):
    """Pack scene tables into the kernel's component-plane layout. Empty
    tables become one fully-padded chunk whose pad values guarantee a miss."""
    s = scene.spheres
    n_s = s.radius.shape[0]
    if n_s:
        c = s.center.T.astype(jnp.float32)                 # (3, S)
        r = s.radius.astype(jnp.float32)
        sph = jnp.concatenate([c, (jnp.sum(c * c, 0) - r * r)[None]], 0)
        sph = _pad_cols(sph, CHUNK, 0.0)
        sph = sph.at[3, n_s:].set(3e38)                    # pad -> disc < 0
    else:
        sph = jnp.zeros((4, CHUNK), jnp.float32).at[3, :].set(3e38)

    rct = scene.rects
    n_r = rct.k.shape[0]
    if n_r:
        eye = jnp.eye(3, dtype=jnp.float32)
        n_hot = eye[rct.axis].T                            # (3, R)
        a_hot = eye[jnp.where(rct.axis == 0, 1, 0)].T
        b_hot = eye[jnp.where(rct.axis == 2, 1, 2)].T
        rows = [n_hot, a_hot, b_hot, rct.k[None], rct.a0[None], rct.a1[None],
                rct.b0[None], rct.b1[None]]
        rec = jnp.concatenate([x.astype(jnp.float32) for x in rows], 0)
        rec = _pad_cols(rec, CHUNK, 0.0)
        rec = rec.at[10, n_r:].set(1.0).at[11, n_r:].set(-1.0)  # a0>a1 -> miss
    else:
        rec = jnp.zeros((14, CHUNK), jnp.float32).at[10, :].set(1.0).at[11, :].set(-1.0)

    tr = scene.triangles
    n_t = tr.mat_id.shape[0]
    if n_t:
        n_geo = jnp.cross(tr.e1, tr.e2)
        rows = [n_geo.T, tr.e1.T, tr.e2.T, jnp.cross(tr.e2, tr.v0).T,
                jnp.cross(tr.e1, tr.v0).T, jnp.sum(tr.v0 * n_geo, -1)[None]]
        tri = jnp.concatenate([x.astype(jnp.float32) for x in rows], 0)
        tri = _pad_cols(tri, CHUNK, 0.0)                   # zeros -> div = 0
    else:
        tri = jnp.zeros((16, CHUNK), jnp.float32)
    return sph, rec, tri


# ----------------------------------------------------------------- kernel

def _closest_kernel(o_ref, d_ref, tmin_ref, tmax_ref,
                    sph_ref, rect_ref, tri_ref,
                    t_out, ty_out, ix_out,
                    *, n_sph: int, n_rect: int, n_tri: int):
    ox, oy, oz = o_ref[:, 0:1], o_ref[:, 1:2], o_ref[:, 2:3]   # (T,1)
    dx, dy, dz = d_ref[:, 0:1], d_ref[:, 1:2], d_ref[:, 2:3]
    tmin = tmin_ref[:]                                          # (T,1)
    tmax = tmax_ref[:]

    best_t = jnp.minimum(tmax, BIG)
    best_ty = jnp.full_like(best_t, -1.0)
    best_ix = jnp.full_like(best_t, -1.0)

    a = dx * dx + dy * dy + dz * dz                             # (T,1)
    inv_a = 1.0 / a
    o_dot_d = ox * dx + oy * dy + oz * dz
    o_sq = ox * ox + oy * oy + oz * oz

    def consider(t, ok, base, code):
        nonlocal best_t, best_ty, best_ix
        tt = jnp.where(ok, t, BIG)
        m = jnp.min(tt, axis=1, keepdims=True)                  # (T,1)
        col = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 1).astype(jnp.float32)
        midx = jnp.min(jnp.where(tt <= m, col, BIG), axis=1, keepdims=True)
        better = m < best_t
        best_t = jnp.where(better, m, best_t)
        best_ty = jnp.where(better, float(code), best_ty)
        best_ix = jnp.where(better, midx + base, best_ix)

    # ------------------------------------------------- spheres (4, S)
    for j in range(0, n_sph, CHUNK):
        cx = sph_ref[0:1, j:j + CHUNK]                          # (1,C)
        cy = sph_ref[1:2, j:j + CHUNK]
        cz = sph_ref[2:3, j:j + CHUNK]
        csq = sph_ref[3:4, j:j + CHUNK]
        half_b = o_dot_d - (dx * cx + dy * cy + dz * cz)        # (T,C)
        c_term = o_sq - 2.0 * (ox * cx + oy * cy + oz * cz) + csq
        disc = half_b * half_b - a * c_term
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        r1 = (-half_b - sq) * inv_a
        r2 = (-half_b + sq) * inv_a
        ok1 = (r1 >= tmin) & (r1 <= tmax)
        ok2 = (r2 >= tmin) & (r2 <= tmax)
        t = jnp.where(ok1, r1, jnp.where(ok2, r2, BIG))
        consider(t, (disc >= 0.0), float(j), PRIM_SPHERE)

    # -------------------------------------------------- rects (14, R)
    for j in range(0, n_rect, CHUNK):
        nx = rect_ref[0:1, j:j + CHUNK]
        ny = rect_ref[1:2, j:j + CHUNK]
        nz = rect_ref[2:3, j:j + CHUNK]
        ax_ = rect_ref[3:4, j:j + CHUNK]
        ay = rect_ref[4:5, j:j + CHUNK]
        az = rect_ref[5:6, j:j + CHUNK]
        bx = rect_ref[6:7, j:j + CHUNK]
        by = rect_ref[7:8, j:j + CHUNK]
        bz = rect_ref[8:9, j:j + CHUNK]
        k = rect_ref[9:10, j:j + CHUNK]
        a0 = rect_ref[10:11, j:j + CHUNK]
        a1 = rect_ref[11:12, j:j + CHUNK]
        b0 = rect_ref[12:13, j:j + CHUNK]
        b1 = rect_ref[13:14, j:j + CHUNK]
        d_n = dx * nx + dy * ny + dz * nz
        o_n = ox * nx + oy * ny + oz * nz
        safe = jnp.abs(d_n) > 1e-12
        t = (k - o_n) / jnp.where(safe, d_n, 1.0)
        pa = (ox * ax_ + oy * ay + oz * az) + t * (dx * ax_ + dy * ay + dz * az)
        pb = (ox * bx + oy * by + oz * bz) + t * (dx * bx + dy * by + dz * bz)
        ok = (safe & (pa >= a0) & (pa <= a1) & (pb >= b0) & (pb <= b1)
              & (t >= tmin) & (t <= tmax))
        consider(t, ok, float(j), PRIM_RECT)

    # ---------------------------------------------- triangles (16, T)
    oxd_x = oy * dz - oz * dy                                   # (T,1)
    oxd_y = oz * dx - ox * dz
    oxd_z = ox * dy - oy * dx
    for j in range(0, n_tri, CHUNK):
        ngx = tri_ref[0:1, j:j + CHUNK]
        ngy = tri_ref[1:2, j:j + CHUNK]
        ngz = tri_ref[2:3, j:j + CHUNK]
        e1x = tri_ref[3:4, j:j + CHUNK]
        e1y = tri_ref[4:5, j:j + CHUNK]
        e1z = tri_ref[5:6, j:j + CHUNK]
        e2x = tri_ref[6:7, j:j + CHUNK]
        e2y = tri_ref[7:8, j:j + CHUNK]
        e2z = tri_ref[8:9, j:j + CHUNK]
        w2x = tri_ref[9:10, j:j + CHUNK]
        w2y = tri_ref[10:11, j:j + CHUNK]
        w2z = tri_ref[11:12, j:j + CHUNK]
        w1x = tri_ref[12:13, j:j + CHUNK]
        w1y = tri_ref[13:14, j:j + CHUNK]
        w1z = tri_ref[14:15, j:j + CHUNK]
        v0n = tri_ref[15:16, j:j + CHUNK]
        div = -(dx * ngx + dy * ngy + dz * ngz)
        safe = div != 0.0
        inv = 1.0 / jnp.where(safe, div, 1.0)
        b1 = ((oxd_x * e2x + oxd_y * e2y + oxd_z * e2z)
              - (dx * w2x + dy * w2y + dz * w2z)) * inv
        b2 = (-(oxd_x * e1x + oxd_y * e1y + oxd_z * e1z)
              + (dx * w1x + dy * w1y + dz * w1z)) * inv
        t = ((ox * ngx + oy * ngy + oz * ngz) - v0n) * inv
        ok = (safe & (b1 >= 0.0) & (b1 <= 1.0) & (b2 >= 0.0)
              & (b1 + b2 <= 1.0) & (t >= tmin) & (t <= tmax))
        consider(t, ok, float(j), PRIM_TRIANGLE)

    miss = best_ty < 0.0
    t_out[:] = jnp.where(miss, BIG, best_t)  # mapped to +inf by the wrapper
    ty_out[:] = best_ty.astype(jnp.int32)
    ix_out[:] = best_ix.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_sph", "n_rect", "n_tri",
                                             "interpret"))
def _call_kernel(o, d, tmin, tmax, sph, rect, tri, *,
                 n_sph, n_rect, n_tri, interpret):
    n = o.shape[0]
    n_pad = -(-n // TILE) * TILE
    pad = n_pad - n
    if pad:
        o = jnp.pad(o, [(0, pad), (0, 0)])
        d = jnp.pad(d, [(0, pad), (0, 0)])   # zero dir -> all tests miss
        tmin = jnp.pad(tmin, [(0, pad)])
        tmax = jnp.pad(tmax, [(0, pad)])
    tmin = tmin[:, None]
    tmax = tmax[:, None]

    grid = (n_pad // TILE,)
    kernel = functools.partial(_closest_kernel, n_sph=n_sph, n_rect=n_rect,
                               n_tri=n_tri)
    flops_per_ray = 30 * n_sph + 40 * n_rect + 50 * n_tri
    t, ty, ix = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_per_ray * n_pad, bytes_accessed=n_pad * 40,
            transcendentals=n_pad * max(1, n_sph)),
        interpret=interpret,
    )(o, d, tmin, tmax, sph, rect, tri)
    t = t[:n, 0]
    return (jnp.where(t >= BIG, jnp.inf, t), ty[:n, 0], ix[:n, 0])


def intersect_pallas(scene: Scene, o, d, t_min, t_max) -> Hit:
    """Closest hit via the fused VMEM-resident kernel."""
    sph, rect, tri = pack_tables(scene)
    n = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    tmax = jnp.broadcast_to(
        jnp.minimum(jnp.asarray(t_max, jnp.float32), BIG), (n,))
    interpret = jax.default_backend() != "tpu"
    t, ty, ix = _call_kernel(
        o, d, tmin, tmax, sph, rect, tri,
        n_sph=sph.shape[1], n_rect=rect.shape[1], n_tri=tri.shape[1],
        interpret=interpret)
    return Hit(t, ty, ix)
