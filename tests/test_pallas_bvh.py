"""Leaf-traversal kernel (ops/pallas_bvh.py) vs the XLA brute-force oracle
(interpret mode on CPU; the same kernel compiles natively on TPU).

The leaf walk must reproduce the closest hit exactly — same t, same
primitive, same extracted attributes — for any wavefront, including rays
with alive=False lanes (whose results are unspecified and unchecked)."""

import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.ops import intersect as ix
from raytracer_tpu.ops.dispatch import intersect_and_attrs
from raytracer_tpu.ops.pallas_bvh import (
    build_leaf_tables, intersect_leaf, intersect_leaf_full, with_leaf_tables,
)
from raytracer_tpu.scene import SceneBuilder
from raytracer_tpu.scene.builtin import cornell_box
from raytracer_tpu.scene.loader import load_scene

DATA = os.path.join(os.path.dirname(__file__), "..", "data")


def rays(n, lo, hi, seed):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.uniform(lo, hi, (n, 3)), jnp.float32),
            jnp.asarray(rng.normal(size=(n, 3)), jnp.float32))


def check_agreement(scene, o, d, t_min=1e-3, t_max=jnp.inf):
    scene = scene._replace(leaf=build_leaf_tables(scene))
    h1 = jax.jit(lambda o, d: ix.intersect_bruteforce(
        scene, o, d, t_min, t_max))(o, d)
    h2 = jax.jit(lambda o, d: intersect_leaf(scene, o, d, t_min, t_max))(o, d)
    t1, t2 = np.asarray(h1.t), np.asarray(h2.t)
    agree = np.isfinite(t1) == np.isfinite(t2)
    assert agree.mean() > 0.995, f"hit/miss disagreement {1 - agree.mean():.4f}"
    both = np.isfinite(t1) & np.isfinite(t2)
    np.testing.assert_allclose(t1[both], t2[both], rtol=1e-4, atol=1e-3)
    same = (np.asarray(h1.prim_type)[both] == np.asarray(h2.prim_type)[both])
    assert same.mean() > 0.99
    # primitive ids must match where both hit and ts agree
    close = both & np.isclose(t1, t2, rtol=1e-4, atol=1e-3)
    ids_ok = (np.asarray(h1.prim_idx)[close]
              == np.asarray(h2.prim_idx)[close])
    assert ids_ok.mean() > 0.98


@pytest.mark.slow
def test_leaf_scene500():
    scene = load_scene(os.path.join(DATA, "scene_500.json"))
    o, d = rays(512, [-12, -6, -12], [12, 6, 12], 0)
    check_agreement(scene, o, d)


@pytest.mark.slow
def test_leaf_scene500_outside_rays():
    scene = load_scene(os.path.join(DATA, "scene_500.json"))
    o, d = rays(512, [-30, 5, -30], [30, 20, 30], 3)
    check_agreement(scene, o, d)


def test_leaf_scene200():
    scene = load_scene(os.path.join(DATA, "scene_200_no_bvh.json"))
    o, d = rays(512, [-12, -6, -12], [12, 6, 12], 1)
    check_agreement(scene, o, d)


@pytest.mark.slow
def test_leaf_mixed_rect_tri():
    # Cornell box + mesh: rects and triangles ride the dense stages while
    # the (few) spheres go through the leaf walk — forced small leaf sizes
    scene = cornell_box(with_mesh=True)
    scene = scene._replace(leaf=build_leaf_tables(scene, leaf_size=2,
                                                  k_slots=2))
    o, d = rays(512, [50, 50, -700], [500, 500, 500], 2)
    h1 = jax.jit(lambda o, d: ix.intersect_bruteforce(
        scene, o, d, 1e-3, jnp.inf))(o, d)
    h2 = jax.jit(lambda o, d: intersect_leaf(scene, o, d, 1e-3, jnp.inf))(o, d)
    t1, t2 = np.asarray(h1.t), np.asarray(h2.t)
    agree = np.isfinite(t1) == np.isfinite(t2)
    assert agree.mean() > 0.995
    both = np.isfinite(t1) & np.isfinite(t2)
    np.testing.assert_allclose(t1[both], t2[both], rtol=1e-4, atol=1e-3)


@pytest.mark.slow
def test_leaf_attrs_match_pallas():
    """Full attrs/features from the leaf kernel equal the dense kernel's."""
    scene = load_scene(os.path.join(DATA, "scene_500.json"))
    leaf_scene = scene._replace(leaf=build_leaf_tables(scene))
    o, d = rays(384, [-12, -6, -12], [12, 6, 12], 4)
    _, a1, f1 = intersect_and_attrs(scene, o, d, 1e-3, jnp.inf, "pallas")
    _, a2, f2 = intersect_leaf_full(leaf_scene, o, d, 1e-3, jnp.inf)
    both = np.asarray(a1.valid) & np.asarray(a2.valid)
    same_prim = both & np.isclose(np.asarray(a1.t), np.asarray(a2.t),
                                  rtol=1e-4, atol=1e-3)
    for x1, x2 in ((a1.normal, a2.normal), (a1.p, a2.p), (a1.uv, a2.uv)):
        np.testing.assert_allclose(np.asarray(x1)[same_prim],
                                   np.asarray(x2)[same_prim],
                                   rtol=1e-3, atol=1e-3)
    assert (np.asarray(a1.mat_id)[same_prim]
            == np.asarray(a2.mat_id)[same_prim]).all()
    np.testing.assert_allclose(np.asarray(f1.color0)[same_prim],
                               np.asarray(f2.color0)[same_prim], rtol=1e-4)


def test_leaf_alive_masking():
    """Dead lanes may return anything; live lanes must be exact regardless
    of how many neighbors are dead."""
    scene = load_scene(os.path.join(DATA, "scene_500.json"))
    scene = scene._replace(leaf=build_leaf_tables(scene))
    o, d = rays(512, [-12, -6, -12], [12, 6, 12], 5)
    rng = np.random.default_rng(6)
    alive = jnp.asarray(rng.random(512) < 0.25, jnp.float32)
    h1 = ix.intersect_bruteforce(scene, o, d, 1e-3, jnp.inf)
    h2 = intersect_leaf(scene, o, d, 1e-3, jnp.inf, alive=alive)
    live = np.asarray(alive) > 0.5
    t1, t2 = np.asarray(h1.t)[live], np.asarray(h2.t)[live]
    assert (np.isfinite(t1) == np.isfinite(t2)).all()
    both = np.isfinite(t1) & np.isfinite(t2)
    np.testing.assert_allclose(t1[both], t2[both], rtol=1e-4, atol=1e-3)


def test_leaf_respects_tmax_tmin():
    b = SceneBuilder()
    m = b.lambertian(b.constant_texture((1, 1, 1)))
    for i in range(8):
        b.add_sphere((0, 0, -3 - i), 0.4, m)
    scene = b.compile()
    scene = scene._replace(leaf=build_leaf_tables(scene, leaf_size=2,
                                                  k_slots=2))
    o = jnp.array([[0.0, 0, 0]], jnp.float32)
    d = jnp.array([[0.0, 0, -1]], jnp.float32)
    h = intersect_leaf(scene, o, d, 1e-3, jnp.inf)
    np.testing.assert_allclose(float(h.t[0]), 2.6, rtol=1e-5)
    h = intersect_leaf(scene, o, d, 1e-3, 1.5)
    assert np.isinf(np.asarray(h.t))[0]
    # t_min past the first sphere finds the second
    h = intersect_leaf(scene, o, d, 3.5, jnp.inf)
    np.testing.assert_allclose(float(h.t[0]), 3.6, rtol=1e-5)


def test_leaf_grazing_phantom_rescue():
    """bf16 candidate false-positives on grazing rays must not shadow a
    genuine hit behind them (ADVICE r2 phantom-miss edge: the exact f32
    recheck rejects the rounded winner; the rescue scan must then find the
    sphere the phantom out-ranked instead of demoting the lane to a miss).

    256 (front, back) sphere pairs; every ray passes OUTSIDE its front
    sphere by a relative margin in [1e-6, 3e-5] — decisive at f32, inside
    the ~8e-6 bf16 candidate rounding band — and squarely hits the back
    sphere. Truth for every lane: the back sphere."""
    b = SceneBuilder()
    m = b.lambertian(b.constant_texture((1, 1, 1)))
    npairs, r_front, r_back = 256, 0.3, 0.5
    # jittered half-integer grid: bf16-exact coordinates never flip, jitter
    # makes the two-term bf16 split round — this seed produces ~70 candidate
    # false-positives across the margin sweep (verified by emulating the
    # kernel's hi+mid gather arithmetic)
    rng = np.random.default_rng(0)
    xs = ((np.arange(npairs) % 16) - 7.5) + rng.uniform(-0.3, 0.3, npairs)
    ys = ((np.arange(npairs) // 16) - 7.5) + rng.uniform(-0.3, 0.3, npairs)
    for i in range(npairs):
        b.add_sphere((float(xs[i]), float(ys[i]), -5.0), r_front, m)
        b.add_sphere((float(xs[i]), float(ys[i]), -9.0), r_back, m)
    scene = b.compile()
    scene = scene._replace(leaf=build_leaf_tables(scene))

    margins = np.geomspace(1e-5, 5e-3, npairs)
    bpar = r_front * (1.0 + margins)                  # just OUTSIDE front
    o = np.stack([xs + bpar, ys, np.zeros(npairs)], -1).astype(np.float32)
    d = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (npairs, 1))
    h = intersect_leaf(scene, jnp.asarray(o), jnp.asarray(d), 1e-3, jnp.inf)
    t = np.asarray(h.t)
    # THE regression: a rejected bf16 front-winner used to demote the lane
    # entirely -> inf (nothing else in the dense stage). Every ray hits the
    # back sphere, so no lane may miss.
    assert np.isfinite(t).all(), (
        f"{(~np.isfinite(t)).sum()} phantom misses (rescue failed)")
    t_back = 9.0 - np.sqrt(r_back ** 2 - bpar ** 2)
    # back hits land in [8.5, 9.0); front-layer hits in (4.6, 5.0] — either
    # exact-form boundary accepts at the smallest margins or genuine clips
    # of a jitter-neighbor's sphere (both layers overlap ray columns)
    is_front = (t > 4.6) & (t < 5.01)
    is_back = (t > 8.45) & (t < 9.0)
    assert (is_back | is_front).all()
    assert is_back.mean() > 0.5
    # back winners carry a back sphere's id (odd insertion index)
    assert (np.asarray(h.prim_idx)[is_back] % 2 == 1).all()
    # most back hits are the ray's own pair at the analytic t
    assert (is_back & (np.abs(t - t_back) < 1e-3)).mean() > 0.4


def test_with_leaf_tables_policy():
    small = cornell_box(with_mesh=False)
    assert with_leaf_tables(small).leaf is None          # too few spheres
    big = load_scene(os.path.join(DATA, "scene_500.json"))
    s2 = with_leaf_tables(big)
    assert s2.leaf is not None
    assert with_leaf_tables(s2) is s2                    # no rebuild
