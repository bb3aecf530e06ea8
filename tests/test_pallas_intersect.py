"""Pallas closest-hit kernel vs the XLA brute-force oracle (interpret mode
on CPU; the same kernel compiles natively on TPU)."""

import os

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.ops import intersect as ix
from raytracer_tpu.ops.pallas_intersect import intersect_pallas
from raytracer_tpu.scene import SceneBuilder
from raytracer_tpu.scene.builtin import cornell_box
from raytracer_tpu.scene.loader import load_scene

DATA = os.path.join(os.path.dirname(__file__), "..", "data")


def check_agreement(scene, o, d, t_min=1e-3, t_max=jnp.inf):
    h1 = jax.jit(lambda o, d: ix.intersect_bruteforce(scene, o, d, t_min, t_max))(o, d)
    h2 = jax.jit(lambda o, d: intersect_pallas(scene, o, d, t_min, t_max))(o, d)
    t1, t2 = np.asarray(h1.t), np.asarray(h2.t)
    agree = np.isfinite(t1) == np.isfinite(t2)
    assert agree.mean() > 0.995, f"hit/miss disagreement {1 - agree.mean():.4f}"
    both = np.isfinite(t1) & np.isfinite(t2)
    np.testing.assert_allclose(t1[both], t2[both], rtol=1e-4, atol=1e-3)
    same_type = np.asarray(h1.prim_type)[both] == np.asarray(h2.prim_type)[both]
    assert same_type.mean() > 0.99


def rays(n, lo, hi, seed):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.uniform(lo, hi, (n, 3)), jnp.float32),
            jnp.asarray(rng.normal(size=(n, 3)), jnp.float32))


def test_pallas_spheres_scene500():
    scene = load_scene(os.path.join(DATA, "scene_500.json"))
    o, d = rays(512, [-12, -6, -12], [12, 6, 12], 0)
    check_agreement(scene, o, d)


def test_pallas_mixed_cornell():
    scene = cornell_box(with_mesh=True)
    o, d = rays(512, [50, 50, -700], [500, 500, 500], 1)
    check_agreement(scene, o, d)


def test_pallas_nonmultiple_ray_count():
    scene = cornell_box(with_mesh=False)
    o, d = rays(333, [50, 50, -700], [500, 500, 500], 2)  # not TILE-aligned
    check_agreement(scene, o, d)


def test_pallas_single_type_tables():
    b = SceneBuilder()
    m = b.lambertian(b.constant_texture((1, 1, 1)))
    b.add_sphere((0, 0, -3), 1.0, m)
    scene = b.compile()  # rects/tris empty -> dummy pad chunks must miss
    o = jnp.array([[0.0, 0, 0], [0, 5, 0]], jnp.float32)
    d = jnp.array([[0.0, 0, -1], [0, 1, 0]], jnp.float32)
    h = intersect_pallas(scene, o, d, 1e-3, jnp.inf)
    np.testing.assert_allclose(float(h.t[0]), 2.0, rtol=1e-5)
    assert np.isinf(np.asarray(h.t))[1]


def test_pallas_respects_tmax():
    b = SceneBuilder()
    m = b.lambertian(b.constant_texture((1, 1, 1)))
    b.add_sphere((0, 0, -3), 1.0, m)
    scene = b.compile()
    o = jnp.array([[0.0, 0, 0]], jnp.float32)
    d = jnp.array([[0.0, 0, -1]], jnp.float32)
    h = intersect_pallas(scene, o, d, 1e-3, 1.5)  # hit is at t=2
    assert np.isinf(np.asarray(h.t))[0]


@pytest.mark.slow
def test_ordered_walk_matches_static_and_brute():
    """Large sphere tables route through the per-tile ordered superchunk
    walk (pallas_intersect.stage_ordered). Its winners must be
    bit-identical to the static two-level scan and agree with the XLA
    brute force — including lanes marked dead and grazing tmax cases."""
    import raytracer_tpu.ops.pallas_intersect as pi
    from raytracer_tpu.scene.builtin import sphere_field

    scene = sphere_field(20000)
    rng = np.random.default_rng(7)
    n = 768
    o = jnp.asarray(rng.uniform(-60, 60, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    alive = jnp.asarray((rng.uniform(size=n) > 0.15), jnp.float32)

    assert pi.ORDER_MIN_CHUNKS <= 20000 // pi.SPH_CHUNK  # ordered route on
    h_ord = intersect_pallas(scene, o, d, 1e-3, jnp.inf, alive=alive)
    check_agreement(scene, o, d)

    old = pi.ORDER_MIN_CHUNKS
    pi.ORDER_MIN_CHUNKS = 10 ** 9
    pi._call_kernel._clear_cache()
    try:
        h_st = intersect_pallas(scene, o, d, 1e-3, jnp.inf, alive=alive)
    finally:
        pi.ORDER_MIN_CHUNKS = old
        pi._call_kernel._clear_cache()
    a = np.asarray(alive) > 0.5
    t1, t2 = np.asarray(h_ord.t)[a], np.asarray(h_st.t)[a]
    assert ((t1 == t2) | (np.isinf(t1) & np.isinf(t2))).all()
    assert (np.asarray(h_ord.prim_idx)[a] == np.asarray(h_st.prim_idx)[a]).all()


def _bunny_scene(extra_spheres=0):
    from raytracer_tpu.scene.builder import trs_matrix
    from raytracer_tpu.utils.obj import load_obj
    mesh = load_obj(os.path.join(DATA, "mesh", "bun315.obj"))
    b = SceneBuilder()
    white = b.lambertian(b.constant_texture((0.73, 0.73, 0.73)))
    b.add_triangles(mesh.positions, mesh.indices, white,
                    normals=mesh.normals,
                    transform=trs_matrix((0, 0, 0), (20, 20, 20), (0, 0, 0)))
    b.add_sphere((0.0, -1000.0, 0.0), 998.0, white)
    if extra_spheres:
        rng = np.random.default_rng(3)
        c = rng.uniform(-4, 4, (extra_spheres, 3)).astype(np.float32)
        r = rng.uniform(0.02, 0.08, extra_spheres).astype(np.float32)
        for i in range(extra_spheres):
            b.add_sphere(tuple(c[i]), float(r[i]), white)
    return b.compile()


def _force_static(pi, scene, o, d, alive):
    old = pi.ORDER_MIN_CHUNKS
    pi.ORDER_MIN_CHUNKS = 10 ** 9
    pi._call_kernel._clear_cache()
    try:
        return intersect_pallas(scene, o, d, 1e-3, jnp.inf, alive=alive)
    finally:
        pi.ORDER_MIN_CHUNKS = old
        pi._call_kernel._clear_cache()


def _assert_walks_equal(h_ord, h_st, alive):
    a = np.asarray(alive) > 0.5
    t1, t2 = np.asarray(h_ord.t)[a], np.asarray(h_st.t)[a]
    assert ((t1 == t2) | (np.isinf(t1) & np.isinf(t2))).all()
    assert (np.asarray(h_ord.prim_idx)[a] == np.asarray(h_st.prim_idx)[a]).all()


@pytest.mark.slow
def test_tri_ordered_walk_matches_static_and_brute():
    """Multi-chunk tri tables (bun315 = 4,968 tris -> 16 padded chunks)
    route through the same per-tile ordered superchunk walk as sphere
    fields; winners must be bit-identical to the static chunk scan and
    agree with the XLA brute force."""
    import raytracer_tpu.ops.pallas_intersect as pi

    scene = _bunny_scene()
    assert pi.ORDER_MIN_CHUNKS <= 16  # tri ordered route on for the bunny
    rng = np.random.default_rng(11)
    n = 768
    o = jnp.asarray(rng.uniform(-4, 4, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    alive = jnp.asarray((rng.uniform(size=n) > 0.15), jnp.float32)

    h_ord = intersect_pallas(scene, o, d, 1e-3, jnp.inf, alive=alive)
    check_agreement(scene, o, d)
    h_st = _force_static(pi, scene, o, d, alive)
    _assert_walks_equal(h_ord, h_st, alive)


@pytest.mark.slow
def test_both_stages_ordered_matches_static():
    """Spheres AND triangles ordered in the same kernel call: the tri
    stage's word/cull base offsets into the shared SMEM tables must not
    alias the sphere stage's (20k spheres -> 24 padded chunks ordered;
    bunny -> 16 tri chunks ordered)."""
    import raytracer_tpu.ops.pallas_intersect as pi

    scene = _bunny_scene(extra_spheres=20000)
    rng = np.random.default_rng(13)
    n = 768
    o = jnp.asarray(rng.uniform(-4, 4, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    alive = jnp.asarray((rng.uniform(size=n) > 0.15), jnp.float32)

    h_ord = intersect_pallas(scene, o, d, 1e-3, jnp.inf, alive=alive)
    h_st = _force_static(pi, scene, o, d, alive)
    _assert_walks_equal(h_ord, h_st, alive)


@pytest.mark.slow
def test_slabbed_run_matches_single(key):
    """Morton-slabbed multi-call dispatch (tables beyond one kernel's VMEM
    capacity) must agree with the single-kernel path: same winner t/type
    everywhere, sphere winner ids mapped back to global, winner data rows
    identical. Forced by shrinking SPH_SLAB below the scene size."""
    import raytracer_tpu.ops.pallas_intersect as pi
    scene = load_scene("data/scene_500.json")  # 1005 spheres
    n = 1024
    k1, k2 = jax.random.split(key)
    o = jax.random.uniform(k1, (n, 3), minval=-12.0, maxval=12.0)
    d = jax.random.normal(k2, (n, 3))
    t1, ty1, ix1, data1 = pi._run(scene, o, d, 1e-3, jnp.inf)
    old = pi.SPH_SLAB
    try:
        pi.SPH_SLAB = 256            # 1005 spheres -> 4 slabs
        t2, ty2, ix2, data2 = pi._run(scene, o, d, 1e-3, jnp.inf)
    finally:
        pi.SPH_SLAB = old
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ty1), np.asarray(ty2))
    hit = np.isfinite(np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(ix1)[hit], np.asarray(ix2)[hit])
    np.testing.assert_allclose(np.asarray(data1)[:, hit],
                               np.asarray(data2)[:, hit],
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_slabbed_rects_and_tris_once(key):
    """Slab chaining must not double-count rect/tri hits (they ride slab 0
    only) and must preserve closest-hit across primitive classes."""
    import raytracer_tpu.ops.pallas_intersect as pi
    scene = cornell_box(with_mesh=True)  # rects + tris + spheres
    n = 512
    k1, k2 = jax.random.split(key)
    o = jax.random.uniform(k1, (n, 3), minval=50.0, maxval=500.0)
    d = jax.random.normal(k2, (n, 3))
    t1, ty1, ix1, _ = pi._run(scene, o, d, 1e-3, jnp.inf)
    old = pi.SPH_SLAB
    try:
        pi.SPH_SLAB = 1              # every sphere its own slab
        t2, ty2, ix2, _ = pi._run(scene, o, d, 1e-3, jnp.inf)
    finally:
        pi.SPH_SLAB = old
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ty1), np.asarray(ty2))


@pytest.mark.slow
def test_tri_slabbed_run_matches_single(key):
    """Triangle slabbing (TRI_SLAB forced below the bunny's 4,968 tris)
    must agree with the single-kernel path: same winner t/type, tri ids
    remapped to global, rect/sphere hits uncorrupted."""
    import raytracer_tpu.ops.pallas_intersect as pi
    scene = _bunny_scene()
    n = 1024
    k1, k2 = jax.random.split(key)
    lo = np.asarray(scene.bounds_min)
    hi = np.asarray(scene.bounds_max)
    o = jnp.asarray(np.random.default_rng(0).uniform(
        lo - 1.0, hi + 1.0, (n, 3)).astype(np.float32))
    d = jax.random.normal(k2, (n, 3))
    t1, ty1, ix1, data1 = pi._run(scene, o, d, 1e-3, jnp.inf)
    old = pi.TRI_SLAB
    try:
        pi.TRI_SLAB = 1024           # 4,968 tris -> 5 slabs
        t2, ty2, ix2, data2 = pi._run(scene, o, d, 1e-3, jnp.inf)
    finally:
        pi.TRI_SLAB = old
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ty1), np.asarray(ty2))
    hit = np.isfinite(np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(ix1)[hit], np.asarray(ix2)[hit])
    np.testing.assert_allclose(np.asarray(data1)[:, hit],
                               np.asarray(data2)[:, hit],
                               rtol=1e-5, atol=1e-5)


def test_slabbed_kernel_trace_count(key):
    """The slab chain must trace the Mosaic kernel a CONSTANT number of
    times regardless of slab count: slab 0 plus at most one lax.scan body
    per oversized table (spheres, tris). The earlier unrolled chain traced
    one kernel instance PER slab — a 4-slab first compile ran long enough
    that killing it wedged the TPU tunnel for hours. Counts _call_kernel
    invocations during an abstract trace (no execution)."""
    import raytracer_tpu.ops.pallas_intersect as pi
    scene = load_scene("data/scene_500.json")  # 1005 spheres
    o = jnp.zeros((256, 3))
    d = jnp.ones((256, 3))

    calls = 0
    real = pi._call_kernel

    def counting(*a, **kw):
        nonlocal calls
        calls += 1
        return real(*a, **kw)

    old = pi.SPH_SLAB
    pi._call_kernel = counting
    try:
        pi.SPH_SLAB = 64             # 1005 spheres -> 16 slabs
        jax.make_jaxpr(
            lambda o, d: pi._run(scene, o, d, 1e-3, jnp.inf))(o, d)
    finally:
        pi.SPH_SLAB = old
        pi._call_kernel = real
    assert calls == 2, calls         # slab 0 + one scanned body


@pytest.mark.slow
def test_ordered_walk_reach_clamp_boundary_grazing():
    """ADVICE r3: stage_ordered's reach cap (t_cap = leave*1.001 + 1e-4,
    the lane's exit-t from the stage AABB) must never flip a true hit to a
    miss for rays originating OUTSIDE the stage box whose winning hit lies
    AT the box boundary — grazing hits on the outermost spheres, where a
    too-tight cap would bite first. Pins (a) exact agreement between the
    ordered walk and the brute force on tangent-grazing boundary rays, and
    (b) bit-identical winners with REACH_CLAMP off (the clamp may only
    skip unreachable work, never change an answer)."""
    import raytracer_tpu.ops.pallas_intersect as pi
    from raytracer_tpu.scene.builtin import sphere_field

    scene = sphere_field(8192)   # 32 chunks of 256: ordered route on
    sph_chunk = pi.eff_chunk(8192, pi.SPH_CHUNK)
    assert pi._wants_order(8192, sph_chunk)

    c = np.asarray(scene.spheres.center)
    r = np.asarray(scene.spheres.radius)
    # the two extreme spheres along +x / -x: their surfaces ARE the stage
    # AABB boundary in x
    i_hi = int(np.argmax(c[:, 0] + r))
    i_lo = int(np.argmin(c[:, 0] - r))
    o_list, d_list = [], []
    for i, side in ((i_hi, +1.0), (i_lo, +1.0), (i_hi, -1.0)):
        ci, ri = c[i], r[i]
        # impact parameters from dead-center to just-outside-tangent; the
        # ray comes from 50 units OUTSIDE the box travelling along -+x, so
        # its stage-box leave-t sits exactly at the far boundary sphere
        for frac in (0.0, 0.5, 0.9, 0.99, 0.999, 1.0 - 1e-6, 1.0, 1.001):
            b = ri * frac
            o_list.append([ci[0] + side * 50.0, ci[1] + b, ci[2]])
            d_list.append([-side, 0.0, 0.0])
            o_list.append([ci[0] + side * 50.0, ci[1], ci[2] + b])
            d_list.append([-side, 0.0, 0.0])
    # pad to a full lane tile with far-miss rays (keep reach finite)
    while len(o_list) % 64:
        o_list.append([500.0, 500.0, 500.0])
        d_list.append([0.0, 1.0, 0.0])
    o = jnp.asarray(np.asarray(o_list, np.float32))
    d = jnp.asarray(np.asarray(d_list, np.float32))

    check_agreement(scene, o, d)

    alive = jnp.ones((o.shape[0],), jnp.float32)
    h_on = intersect_pallas(scene, o, d, 1e-3, jnp.inf, alive=alive)
    assert pi.REACH_CLAMP
    pi.REACH_CLAMP = False
    pi._call_kernel._clear_cache()
    try:
        h_off = intersect_pallas(scene, o, d, 1e-3, jnp.inf, alive=alive)
    finally:
        pi.REACH_CLAMP = True
        pi._call_kernel._clear_cache()
    _assert_walks_equal(h_on, h_off, alive)
