"""Winner-data attribute extraction vs the gather-based oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.ops import intersect as ix
from raytracer_tpu.ops.pallas_intersect import intersect_pallas_full
from raytracer_tpu.scene.builtin import cornell_box
from raytracer_tpu.scene.loader import load_scene

import os
DATA = os.path.join(os.path.dirname(__file__), "..", "data")


def compare(scene, o, d):
    hit2, attrs2, feats2 = jax.jit(
        lambda o, d: intersect_pallas_full(scene, o, d, 1e-3, jnp.inf))(o, d)
    attrs1 = jax.jit(
        lambda o, d: ix.hit_attributes(
            scene, o, d, ix.intersect_bruteforce(scene, o, d, 1e-3, jnp.inf))
    )(o, d)
    v1 = np.asarray(attrs1.valid)
    v2 = np.asarray(attrs2.valid)
    agree = v1 == v2
    assert agree.mean() > 0.995
    both = v1 & v2
    # same winning primitive required for attribute comparison
    same = both & (np.asarray(attrs1.mat_id) == np.asarray(attrs2.mat_id))
    assert same.mean() / max(both.mean(), 1e-9) > 0.98
    np.testing.assert_allclose(np.asarray(attrs1.p)[same],
                               np.asarray(attrs2.p)[same], rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(attrs1.normal)[same],
                               np.asarray(attrs2.normal)[same], atol=2e-3)
    np.testing.assert_allclose(np.asarray(attrs1.uv)[same],
                               np.asarray(attrs2.uv)[same], atol=2e-3)
    np.testing.assert_array_equal(np.asarray(attrs1.front_face)[same],
                                  np.asarray(attrs2.front_face)[same])
    # extracted features must equal the table rows for winner materials
    from raytracer_tpu.ops.materials import fetch_mat_features
    ref = fetch_mat_features(scene, attrs1.mat_id)
    np.testing.assert_array_equal(np.asarray(ref.kind)[same],
                                  np.asarray(feats2.kind)[same])
    np.testing.assert_allclose(np.asarray(ref.color0)[same],
                               np.asarray(feats2.color0)[same], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ref.fuzz)[same],
                               np.asarray(feats2.fuzz)[same], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ref.ir)[same],
                               np.asarray(feats2.ir)[same], atol=1e-5)


def test_attrs_cornell_mixed():
    scene = cornell_box(with_mesh=True)
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform([50, 50, -700], [500, 500, 500], (512, 3)),
                    jnp.float32)
    d = jnp.asarray(rng.normal(size=(512, 3)), jnp.float32)
    compare(scene, o, d)


def test_attrs_scene10():
    scene = load_scene(os.path.join(DATA, "scene_10.json"))
    rng = np.random.default_rng(1)
    o = jnp.asarray(rng.uniform(-8, 8, (512, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(512, 3)), jnp.float32)
    compare(scene, o, d)
