"""SPPM integrator tests (tiny Cornell on CPU)."""

import jax
import numpy as np

from raytracer_tpu.models import path_tracer, sppm
from raytracer_tpu.scene.builtin import cornell_box
from raytracer_tpu.utils.config import RenderConfig, SPPMConfig


def tiny_config(**kw):
    base = dict(
        width=24, height=24, samples_per_pixel=4, spp_chunk=2, max_depth=8,
        sppm=SPPMConfig(n_iterations=3, photons_per_iter=8000,
                        max_photon_bounces=6, max_camera_bounces=8,
                        max_photons_per_cell=32))
    base.update(kw)
    return RenderConfig(**base)


def test_sppm_cornell_bright_and_finite(key):
    """The SPPM Cornell image must be far brighter than the naive-PT one:
    the light's photon power carries scale=1e6 (scene.rs:31) while its Le
    texture is only (1,1,1)."""
    scene = cornell_box(with_mesh=False)
    cfg = tiny_config()
    img, rays, state = sppm.render(scene, cfg, key)
    img = np.asarray(img)
    assert img.shape == (24, 24, 3)
    assert np.isfinite(img).all()
    img_pt, _ = path_tracer.render(scene, cfg, key)
    # compare interior region (borders are black in both)
    box = (slice(6, 18), slice(6, 18))
    assert img[box].mean() > 5.0 * float(np.asarray(img_pt)[box].mean())
    assert img[box].mean() > 0.05


def test_sppm_state_evolves(key):
    scene = cornell_box(with_mesh=False)
    cfg = tiny_config()
    states = []
    img, rays, state = sppm.render(scene, cfg, key,
                                   checkpoint_cb=lambda s: states.append(s))
    assert len(states) == 3
    assert int(state.iteration) == 3
    # radii shrink monotonically where photons accumulate
    r1 = np.asarray(states[0].glob.radius2)
    r3 = np.asarray(states[2].glob.radius2)
    touched = (np.asarray(states[0].glob.photons) > 0) & \
              (np.asarray(states[2].glob.photons) > 0)
    assert touched.sum() > 50
    assert (r3[touched] <= r1[touched] + 1e-9).all()
    # photon counts only grow
    assert (np.asarray(states[2].glob.photons)[touched]
            >= np.asarray(states[0].glob.photons)[touched]).all()


def test_sppm_resume_from_state(key):
    """Checkpoint/resume: rendering 1+2 iterations from a saved state equals
    running 3 straight (same keys)."""
    scene = cornell_box(with_mesh=False)
    cfg = tiny_config()
    img_a, _, state_a = sppm.render(scene, cfg, key)

    cfg1 = tiny_config(sppm=SPPMConfig(
        n_iterations=1, photons_per_iter=8000, max_photon_bounces=6,
        max_camera_bounces=8, max_photons_per_cell=32))
    _, _, state_1 = sppm.render(scene, cfg1, key)
    img_b, _, state_b = sppm.render(scene, cfg, key, state=state_1)
    np.testing.assert_allclose(np.asarray(state_a.glob.flux),
                               np.asarray(state_b.glob.flux), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b),
                               rtol=1e-4, atol=1e-5)
