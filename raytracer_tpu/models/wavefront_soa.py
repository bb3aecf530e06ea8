"""SoA (structure-of-arrays) wavefront bounce loops.

XLA lays (N,3) f32 arrays out as (8,128)-tiled buffers — the minor dim of
3 pads to 128 lanes, a 42.7x allocation expansion on every loop temporary
(measured: the 800x600 PT render held 8.5 GB of temps for a ~50 MB
wavefront, and crossing ~1.5M lanes pushes XLA into buffer
compression/remat that doubles wall-clock; ROUND_NOTES round 2). This
module keeps ALL wavefront state and shading math as separate (N,)
component arrays — (N,3) exists only at the pallas kernel boundary (whose
operands use untiled layouts) and at rare texture-fallback stacks.
Measured: 1.34x on the scene_500 16-bounce trace (928 vs 1245 ms at 960k
lanes), identical radiance.

Semantics are IDENTICAL to models/path_tracer.py::trace_radiance — the
same jax.random keys drive distribution-identical draws (the samplers
below mirror ops/sampling.py stream-for-stream) and the same reference
quirks apply (emit at every hit, DiffuseLight emit-AND-scatter, metal
absorb-below-surface, Schlick/TIR). Eligibility is decided statically by
the caller: the SoA path serves the pallas/leaf intersectors without
volumetric media or motion blur; everything else takes the (N,3) path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from raytracer_tpu.ops.pallas_intersect import N_GEO_SLOTS
from raytracer_tpu.scene.types import (
    INTER_ABSORB, INTER_DIFFUSE, INTER_REFLECT, INTER_REFRACT,
    INTER_SPECULAR, MAT_DIELECTRIC, MAT_DIFFUSE_LIGHT, MAT_LAMBERTIAN,
    MAT_METAL, PRIM_RECT, PRIM_SPHERE, Scene, TEX_CHECKER, TEX_IMAGE,
    TEX_NOISE,
)

PI = 3.141592653589793
TWO_PI = 6.283185307179586
FRAC_1_PI = 0.3183098861837907


def _unit3(x, y, z):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
    return x * inv, y * inv, z * inv


def _uniform_sphere(key, n):
    """Component-wise ops/sampling.py::uniform_sphere — same key splits,
    same draws, same distribution."""
    k1, k2 = jax.random.split(key)
    z = 1.0 - 2.0 * jax.random.uniform(k1, (n,))
    phi = TWO_PI * jax.random.uniform(k2, (n,))
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    return r * jnp.cos(phi), r * jnp.sin(phi), z


class HitSoA(NamedTuple):
    """hit_attributes as (N,) components (hit.rs:24-30 semantics)."""
    valid: jnp.ndarray
    t: jnp.ndarray
    px: jnp.ndarray
    py: jnp.ndarray
    pz: jnp.ndarray
    nx: jnp.ndarray
    ny: jnp.ndarray
    nz: jnp.ndarray
    front: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray


class FeatSoA(NamedTuple):
    """Winner material features as (N,) components."""
    kind: jnp.ndarray
    fuzz: jnp.ndarray
    ir: jnp.ndarray
    tex_kind: jnp.ndarray
    c0r: jnp.ndarray
    c0g: jnp.ndarray
    c0b: jnp.ndarray
    c1r: jnp.ndarray
    c1g: jnp.ndarray
    c1b: jnp.ndarray
    image_id: jnp.ndarray


def attrs_soa(ox, oy, oz, dx, dy, dz, t, ty, data):
    """HitAttrs + features from the pallas kernel's winner data, all (N,)
    components (mirrors pallas_intersect.attrs_from_winner_data)."""
    valid = jnp.isfinite(t)
    tt = jnp.where(valid, t, 0.0)
    px = ox + tt * dx
    py = oy + tt * dy
    pz = oz + tt * dz

    # sphere: slots [cx, cy, cz, csq = |c|^2 - r^2]
    cx, cy, cz = data[:, 0], data[:, 1], data[:, 2]
    r = jnp.sqrt(jnp.maximum(cx * cx + cy * cy + cz * cz - data[:, 3], 1e-20))
    inv_r = 1.0 / r
    snx, sny, snz = (px - cx) * inv_r, (py - cy) * inv_r, (pz - cz) * inv_r

    # rect: slots [n(3), a_hot(3), b_hot(3), k, a0, a1, b0, b1]
    rnx, rny, rnz = data[:, 0], data[:, 1], data[:, 2]
    pa = px * data[:, 3] + py * data[:, 4] + pz * data[:, 5]
    pb = px * data[:, 6] + py * data[:, 7] + pz * data[:, 8]
    a0, a1 = data[:, 10], data[:, 11]
    b0, b1 = data[:, 12], data[:, 13]
    rect_u = (pa - a0) / jnp.where(a1 != a0, a1 - a0, 1.0)
    rect_v = (pb - b0) / jnp.where(b1 != b0, b1 - b0, 1.0)

    # triangle: slots [b1, b2, n0(3), n1(3), n2(3)]
    tb1, tb2 = data[:, 0], data[:, 1]
    tb0 = 1.0 - tb1 - tb2
    tnx = tb0 * data[:, 2] + tb1 * data[:, 5] + tb2 * data[:, 8]
    tny = tb0 * data[:, 3] + tb1 * data[:, 6] + tb2 * data[:, 9]
    tnz = tb0 * data[:, 4] + tb1 * data[:, 7] + tb2 * data[:, 10]
    tnx, tny, tnz = _unit3(tnx, tny, tnz)

    is_s = ty == PRIM_SPHERE
    is_r = ty == PRIM_RECT
    nox = jnp.where(is_s, snx, jnp.where(is_r, rnx, tnx))
    noy = jnp.where(is_s, sny, jnp.where(is_r, rny, tny))
    noz = jnp.where(is_s, snz, jnp.where(is_r, rnz, tnz))
    # sphere UV (sphere.rs:16-21)
    theta = jnp.arccos(jnp.clip(-sny, -1.0, 1.0))
    phi = jnp.arctan2(-snz, snx) + PI
    u = jnp.where(is_s, phi / TWO_PI, jnp.where(is_r, rect_u, 0.0))
    v = jnp.where(is_s, theta / PI, jnp.where(is_r, rect_v, 0.0))

    front = (dx * nox + dy * noy + dz * noz) < 0.0
    sgn = jnp.where(front, 1.0, -1.0)
    nx, ny, nz = _unit3(nox * sgn, noy * sgn, noz * sgn)

    fb = N_GEO_SLOTS
    feats = FeatSoA(
        kind=jnp.round(data[:, fb + 0]).astype(jnp.int32),
        fuzz=data[:, fb + 1], ir=jnp.maximum(data[:, fb + 2], 1e-6),
        tex_kind=jnp.round(data[:, fb + 3]).astype(jnp.int32),
        c0r=data[:, fb + 4], c0g=data[:, fb + 5], c0b=data[:, fb + 6],
        c1r=data[:, fb + 7], c1g=data[:, fb + 8], c1b=data[:, fb + 9],
        image_id=jnp.round(data[:, fb + 10]).astype(jnp.int32))
    return HitSoA(valid, t, px, py, pz, nx, ny, nz, front, u, v), feats


def eval_texture_soa(scene: Scene, f: FeatSoA, h: HitSoA):
    """eval_texture_from, component-wise. Image/noise textures fall back to
    small stacked fetches (rare; their gathers need (N,3)/(N,2) forms)."""
    sines = (jnp.sin(10.0 * h.px) * jnp.sin(10.0 * h.py)
             * jnp.sin(10.0 * h.pz))
    neg = sines < 0.0
    chk = f.tex_kind == TEX_CHECKER
    ar = jnp.where(chk & ~neg, f.c1r, f.c0r)
    ag = jnp.where(chk & ~neg, f.c1g, f.c0g)
    ab = jnp.where(chk & ~neg, f.c1b, f.c0b)
    if scene.images.shape[0]:
        img_id = jnp.maximum(f.image_id, 0)
        wh = scene.image_wh[img_id]
        w = wh[:, 0].astype(jnp.float32)
        ht = wh[:, 1].astype(jnp.float32)
        uu = jnp.clip(h.u, 0.0, 1.0)
        vv = 1.0 - jnp.clip(h.v, 0.0, 1.0)
        x = jnp.clip(jnp.floor(w * uu).astype(jnp.int32), 0, wh[:, 0] - 1)
        y = jnp.clip(jnp.floor(ht * vv).astype(jnp.int32), 0, wh[:, 1] - 1)
        img = scene.images[img_id, y, x]                     # (N, 3)
        is_img = f.tex_kind == TEX_IMAGE
        ar = jnp.where(is_img, img[:, 0], ar)
        ag = jnp.where(is_img, img[:, 1], ag)
        ab = jnp.where(is_img, img[:, 2], ab)
    if scene.textures.noise_marker.shape[0]:
        from raytracer_tpu.ops import noise as noise_ops
        p3 = jnp.stack([h.px, h.py, h.pz], -1)
        marble = noise_ops.marble(p3, f.c0r)
        is_noise = f.tex_kind == TEX_NOISE
        ar = jnp.where(is_noise, marble, ar)
        ag = jnp.where(is_noise, marble, ag)
        ab = jnp.where(is_noise, marble, ab)
    return ar, ag, ab


class ScatterSoA(NamedTuple):
    interaction: jnp.ndarray  # (N,) int32
    dx: jnp.ndarray
    dy: jnp.ndarray
    dz: jnp.ndarray
    ar: jnp.ndarray           # attenuation rgb
    ag: jnp.ndarray
    ab: jnp.ndarray
    er: jnp.ndarray           # emitted rgb
    eg: jnp.ndarray
    eb: jnp.ndarray


def scatter_soa(scene: Scene, key, dx, dy, dz, h: HitSoA,
                f: FeatSoA) -> ScatterSoA:
    """materials.scatter, component-wise, stream-identical draws
    (material.rs:92-212 semantics; same keys/shapes as ops/materials.py)."""
    n = dx.shape[0]
    k_diff, k_metal, k_diel, _k_iso = jax.random.split(key, 4)
    alr, alg, alb = eval_texture_soa(scene, f, h)

    # Lambertian / DiffuseLight: n + unit_sphere, near-zero guard
    sx, sy, sz = _uniform_sphere(k_diff, n)
    ldx, ldy, ldz = h.nx + sx, h.ny + sy, h.nz + sz
    small = (ldx * ldx + ldy * ldy + ldz * ldz) < 1e-16
    ldx = jnp.where(small, h.nx, ldx)
    ldy = jnp.where(small, h.ny, ldy)
    ldz = jnp.where(small, h.nz, ldz)

    # Metal: reflect(unit_d) + fuzz * unit_sphere; absorb below surface
    ux, uy, uz = _unit3(dx, dy, dz)
    dn = ux * h.nx + uy * h.ny + uz * h.nz
    rfx = ux - 2.0 * dn * h.nx
    rfy = uy - 2.0 * dn * h.ny
    rfz = uz - 2.0 * dn * h.nz
    mx, my, mz = _uniform_sphere(k_metal, n)
    mdx = rfx + f.fuzz * mx
    mdy = rfy + f.fuzz * my
    mdz = rfz + f.fuzz * mz
    metal_ok = (mdx * h.nx + mdy * h.ny + mdz * h.nz) > 0.0

    # Dielectric: Schlick + TIR + stochastic reflect/refract
    ratio = jnp.where(h.front, 1.0 / f.ir, f.ir)
    cos_t = jnp.minimum(-(ux * h.nx + uy * h.ny + uz * h.nz), 1.0)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    cannot = ratio * sin_t > 1.0
    r0 = ((1.0 - ratio) / (1.0 + ratio)) ** 2
    refl = r0 + (1.0 - r0) * (1.0 - cos_t) ** 5
    do_refl = cannot | (refl > jax.random.uniform(k_diel, (n,)))
    ppx = ratio * (ux + cos_t * h.nx)
    ppy = ratio * (uy + cos_t * h.ny)
    ppz = ratio * (uz + cos_t * h.nz)
    par = -jnp.sqrt(jnp.abs(1.0 - (ppx * ppx + ppy * ppy + ppz * ppz)))
    rex = ppx + par * h.nx
    rey = ppy + par * h.ny
    rez = ppz + par * h.nz
    ddx = jnp.where(do_refl, rfx, rex)
    ddy = jnp.where(do_refl, rfy, rey)
    ddz = jnp.where(do_refl, rfz, rez)

    is_lam = f.kind == MAT_LAMBERTIAN
    is_met = f.kind == MAT_METAL
    is_die = f.kind == MAT_DIELECTRIC
    is_lgt = f.kind == MAT_DIFFUSE_LIGHT
    diffish = is_lam | is_lgt

    odx = jnp.where(diffish, ldx, jnp.where(is_met, mdx, ddx))
    ody = jnp.where(diffish, ldy, jnp.where(is_met, mdy, ddy))
    odz = jnp.where(diffish, ldz, jnp.where(is_met, mdz, ddz))
    ar = jnp.where(is_lgt, FRAC_1_PI, alr)
    ag = jnp.where(is_lgt, FRAC_1_PI, alg)
    ab = jnp.where(is_lgt, FRAC_1_PI, alb)
    inter = jnp.where(diffish, INTER_DIFFUSE,
            jnp.where(is_met,
                      jnp.where(metal_ok, INTER_SPECULAR, INTER_ABSORB),
            jnp.where(is_die,
                      jnp.where(do_refl, INTER_REFLECT, INTER_REFRACT),
                      INTER_DIFFUSE)))
    inter = jnp.where(h.valid, inter, INTER_ABSORB).astype(jnp.int32)
    lit = is_lgt & h.valid
    er = jnp.where(lit, alr, 0.0)
    eg = jnp.where(lit, alg, 0.0)
    eb = jnp.where(lit, alb, 0.0)
    return ScatterSoA(inter, odx, ody, odz, ar, ag, ab, er, eg, eb)


RR_START_BOUNCE = 3


def trace_radiance_soa(scene: Scene, o, d, key, *, max_depth: int,
                       t_min: float, spawn_eps, intersector: str,
                       russian_roulette: bool = True, nee: bool = False):
    """SoA twin of path_tracer.trace_radiance for the pallas/leaf
    intersectors (no media, no motion blur). Returns (radiance (N,3),
    rays ()).

    Stream compaction was measured and rejected a THIRD time here: even
    with (N,) component state the stable-partition's in-loop scatter is
    pathological on TPU (667 -> 3533 ms per 16-bounce trace with it on;
    ROUND_NOTES round 2). Dead lanes stay in place; the kernels' alive
    masking carries the savings instead."""
    n = o.shape[0]

    def cond(s):
        return (s[0] < max_depth) & jnp.any(s[14])

    def body(s):
        (b, ox, oy, oz, dx, dy, dz, tr, tg, tb,
         rr_, rg_, rb_, prev_diff, alive, rays) = s
        k = jax.random.fold_in(key, b)
        o3 = jnp.stack([ox, oy, oz], -1)
        d3 = jnp.stack([dx, dy, dz], -1)
        # one kernel call; everything downstream re-derives as components
        # from the winner data (no (N,3) attrs materialize)
        if intersector == "leaf":
            t, ty, _ix, data = _leaf_run(scene, o3, d3, t_min, alive)
        else:
            from raytracer_tpu.ops.pallas_intersect import _run as _prun
            t, ty, _ix, data = _prun(scene, o3, d3, t_min, jnp.inf,
                                     alive=alive)
        h, f = attrs_soa(ox, oy, oz, dx, dy, dz, t, ty, data)
        sc = scatter_soa(scene, k, dx, dy, dz, h, f)

        live = alive & h.valid
        emit_ok = live & ~prev_diff
        rr_ = rr_ + jnp.where(emit_ok, tr * sc.er, 0.0)
        rg_ = rg_ + jnp.where(emit_ok, tg * sc.eg, 0.0)
        rb_ = rb_ + jnp.where(emit_ok, tb * sc.eb, 0.0)

        diffuse_now = live & (sc.interaction == INTER_DIFFUSE)
        if nee:
            from raytracer_tpu.ops.nee import direct_light
            p3 = jnp.stack([h.px, h.py, h.pz], -1)
            n3 = jnp.stack([h.nx, h.ny, h.nz], -1)
            a3 = jnp.stack([sc.ar, sc.ag, sc.ab], -1)
            dl = direct_light(scene, jax.random.fold_in(k, 53), p3, n3, a3,
                              diffuse_now, intersector=intersector,
                              alive=alive)
            rr_ = rr_ + jnp.where(diffuse_now, tr * dl[:, 0], 0.0)
            rg_ = rg_ + jnp.where(diffuse_now, tg * dl[:, 1], 0.0)
            rb_ = rb_ + jnp.where(diffuse_now, tb * dl[:, 2], 0.0)

        cont = live & (sc.interaction != INTER_ABSORB)
        tr2 = jnp.where(cont, tr * sc.ar, tr)
        tg2 = jnp.where(cont, tg * sc.ag, tg)
        tb2 = jnp.where(cont, tb * sc.ab, tb)
        if russian_roulette:
            p_surv = jnp.clip(jnp.maximum(tr2, jnp.maximum(tg2, tb2)),
                              0.05, 1.0)
            do_rr = b >= RR_START_BOUNCE
            u = jax.random.uniform(jax.random.fold_in(k, 37), (n,))
            survive = ~do_rr | (u < p_surv)
            scale = jnp.where(do_rr & cont & survive, 1.0 / p_surv, 1.0)
            tr2, tg2, tb2 = tr2 * scale, tg2 * scale, tb2 * scale
            cont = cont & survive
        side = jnp.sign(sc.dx * h.nx + sc.dy * h.ny + sc.dz * h.nz) * spawn_eps
        ox2 = jnp.where(cont, h.px + h.nx * side, ox)
        oy2 = jnp.where(cont, h.py + h.ny * side, oy)
        oz2 = jnp.where(cont, h.pz + h.nz * side, oz)
        dx2 = jnp.where(cont, sc.dx, dx)
        dy2 = jnp.where(cont, sc.dy, dy)
        dz2 = jnp.where(cont, sc.dz, dz)
        prev2 = diffuse_now if nee else prev_diff
        return (b + 1, ox2, oy2, oz2, dx2, dy2, dz2, tr2, tg2, tb2,
                rr_, rg_, rb_, prev2, cont, rays + jnp.sum(alive))

    one = jnp.ones_like(o[:, 0])
    zero = jnp.zeros_like(one)
    alive0 = o[:, 0] == o[:, 0]
    init = (jnp.int32(0), o[:, 0], o[:, 1], o[:, 2],
            d[:, 0], d[:, 1], d[:, 2], one, one * 1.0, one * 1.0,
            zero, zero * 1.0, zero * 1.0, ~alive0, alive0,
            jnp.sum(jnp.zeros_like(o[:, 0], jnp.int32)))
    s = jax.lax.while_loop(cond, body, init)
    return jnp.stack([s[10], s[11], s[12]], -1), s[15]


def _leaf_run(scene, o3, d3, t_min, alive):
    from raytracer_tpu.ops import pallas_bvh
    return pallas_bvh._run(scene, o3, d3, t_min, jnp.inf, alive)


def gather_walk_soa(scene: Scene, o, d, est, k_walk, *, max_depth: int,
                    t_min: float, spawn_eps, intersector: str):
    """SoA twin of models/sppm.py::gather_walk (sample_ray,
    photon_mapper.rs:326-365): Le at every hit, the lane's density estimate
    at the first Diffuse hit, specular chains multiply throughput. ``est``
    is (N, 3). Returns (radiance (N,3), rays ())."""
    n = o.shape[0]
    er_, eg_, eb_ = est[:, 0], est[:, 1], est[:, 2]

    def cond(s):
        return (s[0] < max_depth) & jnp.any(s[13])

    def body(s):
        (b, ox, oy, oz, dx, dy, dz, tr, tg, tb, rr_, rg_, rb_,
         alive, rays) = s
        k = jax.random.fold_in(k_walk, b)
        o3 = jnp.stack([ox, oy, oz], -1)
        d3 = jnp.stack([dx, dy, dz], -1)
        if intersector == "leaf":
            t, ty, _ix, data = _leaf_run(scene, o3, d3, t_min, alive)
        else:
            from raytracer_tpu.ops.pallas_intersect import _run as _prun
            t, ty, _ix, data = _prun(scene, o3, d3, t_min, jnp.inf,
                                     alive=alive)
        h, f = attrs_soa(ox, oy, oz, dx, dy, dz, t, ty, data)
        sc = scatter_soa(scene, k, dx, dy, dz, h, f)
        live = alive & h.valid
        rr_ = rr_ + jnp.where(live, tr * sc.er, 0.0)
        rg_ = rg_ + jnp.where(live, tg * sc.eg, 0.0)
        rb_ = rb_ + jnp.where(live, tb * sc.eb, 0.0)
        diffuse_now = live & (sc.interaction == INTER_DIFFUSE)
        rr_ = rr_ + jnp.where(diffuse_now, tr * er_, 0.0)
        rg_ = rg_ + jnp.where(diffuse_now, tg * eg_, 0.0)
        rb_ = rb_ + jnp.where(diffuse_now, tb * eb_, 0.0)
        cont = live & ~diffuse_now & (sc.interaction != INTER_ABSORB)
        tr2 = jnp.where(cont, tr * sc.ar, tr)
        tg2 = jnp.where(cont, tg * sc.ag, tg)
        tb2 = jnp.where(cont, tb * sc.ab, tb)
        side = jnp.sign(sc.dx * h.nx + sc.dy * h.ny + sc.dz * h.nz) * spawn_eps
        ox2 = jnp.where(cont, h.px + h.nx * side, ox)
        oy2 = jnp.where(cont, h.py + h.ny * side, oy)
        oz2 = jnp.where(cont, h.pz + h.nz * side, oz)
        dx2 = jnp.where(cont, sc.dx, dx)
        dy2 = jnp.where(cont, sc.dy, dy)
        dz2 = jnp.where(cont, sc.dz, dz)
        return (b + 1, ox2, oy2, oz2, dx2, dy2, dz2, tr2, tg2, tb2,
                rr_, rg_, rb_, cont, rays + jnp.sum(alive))

    one = jnp.ones_like(o[:, 0])
    zero = jnp.zeros_like(one)
    alive0 = o[:, 0] == o[:, 0]
    init = (jnp.int32(0), o[:, 0], o[:, 1], o[:, 2],
            d[:, 0], d[:, 1], d[:, 2], one, one * 1.0, one * 1.0,
            zero, zero * 1.0, zero * 1.0, alive0,
            jnp.sum(jnp.zeros_like(o[:, 0], jnp.int32)))
    s = jax.lax.while_loop(cond, body, init)
    return jnp.stack([s[10], s[11], s[12]], -1), s[14]


def measurement_soa(scene: Scene, o, d, *, k_walk, max_depth: int,
                    t_min: float, spawn_eps, intersector: str):
    """SoA twin of models/sppm.py::measurement_pass (update_sppm's specular
    walk to the first Diffuse hit, photon_mapper.rs:277-300). Returns
    (valid (N,), p (N,3), normal (N,3), bsdf (N,3))."""
    n = o.shape[0]

    def cond(s):
        return (s[0] < max_depth) & jnp.any(s[7])

    def body(s):
        (b, ox, oy, oz, dx, dy, dz, alive,
         ov, opx, opy, opz, onx, ony, onz, obr, obg, obb) = s
        k = jax.random.fold_in(k_walk, b)
        o3 = jnp.stack([ox, oy, oz], -1)
        d3 = jnp.stack([dx, dy, dz], -1)
        if intersector == "leaf":
            t, ty, _ix, data = _leaf_run(scene, o3, d3, t_min, alive)
        else:
            from raytracer_tpu.ops.pallas_intersect import _run as _prun
            t, ty, _ix, data = _prun(scene, o3, d3, t_min, jnp.inf,
                                     alive=alive)
        h, f = attrs_soa(ox, oy, oz, dx, dy, dz, t, ty, data)
        sc = scatter_soa(scene, k, dx, dy, dz, h, f)
        live = alive & h.valid
        diffuse_now = live & (sc.interaction == INTER_DIFFUSE)
        # bsdf color = albedo, 1/pi for diffuse lights (material.rs bsdf) —
        # exactly scatter's attenuation; no second texture evaluation
        br, bg, bb = sc.ar, sc.ag, sc.ab
        ov2 = ov | diffuse_now
        opx2 = jnp.where(diffuse_now, h.px, opx)
        opy2 = jnp.where(diffuse_now, h.py, opy)
        opz2 = jnp.where(diffuse_now, h.pz, opz)
        onx2 = jnp.where(diffuse_now, h.nx, onx)
        ony2 = jnp.where(diffuse_now, h.ny, ony)
        onz2 = jnp.where(diffuse_now, h.nz, onz)
        obr2 = jnp.where(diffuse_now, br, obr)
        obg2 = jnp.where(diffuse_now, bg, obg)
        obb2 = jnp.where(diffuse_now, bb, obb)
        cont = live & ~diffuse_now & (sc.interaction != INTER_ABSORB)
        side = jnp.sign(sc.dx * h.nx + sc.dy * h.ny + sc.dz * h.nz) * spawn_eps
        ox2 = jnp.where(cont, h.px + h.nx * side, ox)
        oy2 = jnp.where(cont, h.py + h.ny * side, oy)
        oz2 = jnp.where(cont, h.pz + h.nz * side, oz)
        dx2 = jnp.where(cont, sc.dx, dx)
        dy2 = jnp.where(cont, sc.dy, dy)
        dz2 = jnp.where(cont, sc.dz, dz)
        return (b + 1, ox2, oy2, oz2, dx2, dy2, dz2, cont,
                ov2, opx2, opy2, opz2, onx2, ony2, onz2, obr2, obg2, obb2)

    zero = jnp.zeros_like(o[:, 0])
    alive0 = o[:, 0] == o[:, 0]
    init = (jnp.int32(0), o[:, 0], o[:, 1], o[:, 2],
            d[:, 0], d[:, 1], d[:, 2], alive0,
            ~alive0, zero, zero * 1.0, zero * 1.0,
            zero * 1.0, zero * 1.0, zero * 1.0,
            zero * 1.0, zero * 1.0, zero * 1.0)
    s = jax.lax.while_loop(cond, body, init)
    return (s[8], jnp.stack([s[9], s[10], s[11]], -1),
            jnp.stack([s[12], s[13], s[14]], -1),
            jnp.stack([s[15], s[16], s[17]], -1))


def scatter_photon_soa(scene: Scene, key, dx, dy, dz, h: HitSoA, f: FeatSoA):
    """materials.scatter_photon, component-wise, stream-identical draws
    (material.rs:27-45 Russian roulette with power renormalization).
    Returns (ScatterSoA with RR-adjusted interaction, pr, pg, pb power
    scale factors to apply to surviving photons)."""
    k_scatter, k_rr = jax.random.split(key)
    sc = scatter_soa(scene, k_scatter, dx, dy, dz, h, f)
    hmax = jnp.maximum(sc.ar, jnp.maximum(sc.ag, sc.ab))
    survive = jax.random.uniform(k_rr, hmax.shape) <= hmax
    inter = jnp.where(survive, sc.interaction, INTER_ABSORB).astype(jnp.int32)
    inv_h = 1.0 / jnp.maximum(hmax, 1e-12)
    pr = jnp.where(survive, sc.ar * inv_h, 1.0)
    pg = jnp.where(survive, sc.ag * inv_h, 1.0)
    pb = jnp.where(survive, sc.ab * inv_h, 1.0)
    return sc._replace(interaction=inter), pr, pg, pb


def trace_photon_deposits_soa(scene: Scene, key, n_photons: int,
                              max_bounces: int, t_min: float, spawn_eps,
                              intersector: str):
    """SoA twin of models/sppm.py::trace_photon_deposits. Deposits come
    back as flat (n_photons*max_bounces,) COMPONENT arrays — the AoS
    version's (bounces, N, 3) scan stacks were (8,128)-tile padded 42x.
    Returns (px, py, pz, wr, wg, wb, nx, ny, nz, valid, caustic)."""
    from raytracer_tpu.ops.lights import emit_photons
    ph = emit_photons(scene.lights, key, n_photons)
    n = n_photons

    def step(s, _):
        (ox, oy, oz, dx, dy, dz, wr, wg, wb,
         alive, has_spec, has_diff, b) = s
        k = jax.random.fold_in(jax.random.fold_in(key, 13), b)
        o3 = jnp.stack([ox, oy, oz], -1)
        d3 = jnp.stack([dx, dy, dz], -1)
        if intersector == "leaf":
            t, ty, _ix, data = _leaf_run(scene, o3, d3, t_min, alive)
        else:
            from raytracer_tpu.ops.pallas_intersect import _run as _prun
            t, ty, _ix, data = _prun(scene, o3, d3, t_min, jnp.inf,
                                     alive=alive)
        h, f = attrs_soa(ox, oy, oz, dx, dy, dz, t, ty, data)
        sc, pr, pg, pb = scatter_photon_soa(scene, k, dx, dy, dz, h, f)

        live = alive & h.valid
        diffuse_now = live & (sc.interaction == INTER_DIFFUSE)
        # deposit carries the power BEFORE this bounce's renormalization
        # (photon_mapper.rs:248 pushes `power`, then updates it)
        deposit = (h.px, h.py, h.pz, wr, wg, wb, h.nx, h.ny, h.nz,
                   diffuse_now, diffuse_now & has_spec & ~has_diff)

        cont = live & (sc.interaction != INTER_ABSORB)
        specular_now = cont & ~diffuse_now
        side = jnp.sign(sc.dx * h.nx + sc.dy * h.ny + sc.dz * h.nz) * spawn_eps
        ox2 = jnp.where(cont, h.px + h.nx * side, ox)
        oy2 = jnp.where(cont, h.py + h.ny * side, oy)
        oz2 = jnp.where(cont, h.pz + h.nz * side, oz)
        dx2 = jnp.where(cont, sc.dx, dx)
        dy2 = jnp.where(cont, sc.dy, dy)
        dz2 = jnp.where(cont, sc.dz, dz)
        wr2 = jnp.where(cont, wr * pr, wr)
        wg2 = jnp.where(cont, wg * pg, wg)
        wb2 = jnp.where(cont, wb * pb, wb)
        return ((ox2, oy2, oz2, dx2, dy2, dz2, wr2, wg2, wb2, cont,
                 has_spec | specular_now, has_diff | diffuse_now, b + 1),
                deposit)

    alive0 = ph.origin[:, 0] == ph.origin[:, 0]
    init = (ph.origin[:, 0], ph.origin[:, 1], ph.origin[:, 2],
            ph.dir[:, 0], ph.dir[:, 1], ph.dir[:, 2],
            ph.power[:, 0], ph.power[:, 1], ph.power[:, 2],
            alive0, ~alive0, ~alive0, jnp.int32(0))
    _, dep = jax.lax.scan(step, init, None, length=max_bounces)
    return tuple(a.reshape(-1) for a in dep)
