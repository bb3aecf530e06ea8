"""Sharded SPPM iteration on the 8-virtual-device mesh."""

import jax
import numpy as np

from raytracer_tpu.models import sppm as sppm_model
from raytracer_tpu.parallel import render as prender
from raytracer_tpu.parallel.sppm import sppm_iteration_sharded
from raytracer_tpu.scene.builtin import cornell_box


def run_iters(n_iters, key):
    scene = cornell_box(with_mesh=False)
    W = H = 24
    state = sppm_model.init_state(W * H)
    mesh = prender.make_mesh(n_px=8, n_spp=1)
    kw = dict(mesh=mesh, width=W, height=H, n_photons=8000,
              max_photon_bounces=6, max_camera_bounces=8,
              grid_res=(8, 8, 8), k_per_cell=32, alpha=0.7,
              k_global=100.0, k_caustic=50.0, t_min=1e-3, photon_t_min=1e-4,
              spawn_eps_rel=1e-4, query_chunk=128)
    for _ in range(n_iters):
        state = sppm_iteration_sharded(scene, state, key, **kw)
    return scene, state


def test_sharded_sppm_state_behaves(key):
    scene, state = run_iters(2, key)
    g = state.glob
    photons = np.asarray(g.photons)
    assert int(state.iteration) == 2
    assert (photons > 0).mean() > 0.2          # plenty of pixels touched
    r2 = np.asarray(g.radius2)[photons > 0]
    assert np.isfinite(r2).all() and (r2 > 0).all()
    flux = np.asarray(g.flux)
    assert np.isfinite(flux).all() and flux.max() > 0


def test_sharded_sppm_gather_image(key):
    scene, state = run_iters(2, key)
    img, rays = sppm_model.gather_fn(
        scene, state, key, width=24, height=24, spp=4, spp_chunk=2,
        max_depth=8, t_min=1e-3, spawn_eps_rel=1e-4,
        n_total_photons=2 * 8000)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img[6:18, 6:18].mean() > 0.01  # lit interior
