"""Render configuration (replaces the reference's lazy_static CONFIGS +
scattered hard-coded constants, main.rs:26-47).

Every constant the reference buries at a point of use becomes an explicit
field here, with the reference's value as the default:
- width/height 800x800, aspect 1.0          main.rs:34-35,45
- samples per pixel 256                      camera.rs:73
- max bounce depth 50                        photon_mapper.rs:334
- SPPM: 50 iters x 500k photons, alpha 0.7,
  kNN init 100 (global) / 50 (caustic)       photon_mapper.rs:17-19,148-149
- camera-ray epsilon 0.001 / photon 0.0001   photon_mapper.rs:285,242

The reference's compile-time CI sniff (option_env!("CI"), main.rs:22-24)
becomes the explicit ``ci_preset()`` constructor.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class SPPMConfig:
    """SPPM integrator knobs. photon_mapper.rs:17-19,148-149."""
    n_iterations: int = 50
    photons_per_iter: int = 500_000
    alpha: float = 0.7
    k_global: int = 100          # GLOBAL_INIT_PHOTONS (kNN radius init)
    k_caustic: int = 50          # CAUSTIC_INIT_PHOTONS
    max_photon_bounces: int = 16  # reference loop is RR-terminated/unbounded
    max_camera_bounces: int = 50  # specular-walk cap, photon_mapper.rs:334
    # Uniform-grid photon map (TPU replacement for the kd-tree):
    max_photons_per_cell: int = 64   # gather cap per neighbor cell
    # Query implementation: "dense" = VMEM-resident pallas kernel (exact,
    # no per-cell cap, HBM-light — ops/pallas_photon.py); "grid" = the XLA
    # 27-cell gather (ops/photon_grid.py), kept as oracle/fallback.
    query_impl: str = "dense"
    # Measurement/update dispatches are split into pixel blocks of this size
    # for large images (single dispatches >~2min can crash the TPU worker)
    pixel_block: int = 1 << 18


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Top-level render settings (reference defaults)."""
    width: int = 800
    height: int = 800
    samples_per_pixel: int = 256
    max_depth: int = 50
    # Batching: rays processed per device step = width*height*spp_chunk is
    # capped by splitting spp into chunks of this size.
    spp_chunk: int = 4
    # Host-side dispatch batching: one jit call renders at most this many
    # samples per pixel (very long single dispatches can trip device/tunnel
    # timeouts; batching also gives natural progress/checkpoint points).
    host_spp_batch: int = 64
    seed: int = 0
    # Self-intersection epsilons. The reference uses absolute 1e-3 (camera,
    # photon_mapper.rs:285) / 1e-4 (photons, photon_mapper.rs:242) in f64;
    # in f32 at Cornell scale (~555 units) we additionally offset spawn
    # points along the normal by rel_eps * scene_scale. rel_eps is 1e-5,
    # NOT 1e-4: scene.scale is global, and at scene_500's scale a 1e-4
    # offset (0.035) matches its radius-0.045 emitters — spawned bounce
    # rays land inside/past nearby lights, inflating plain PT +10% and
    # deflating --nee -25% vs the eps-converged image; 1e-5 agrees with
    # the 1e-6 render to 0.4% on every checked scene and shows no acne on
    # Cornell/spheres/fields (ROUND_NOTES r5).
    t_min: float = 1e-3
    spawn_eps_rel: float = 1e-5
    background: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    # Unbiased Russian-roulette path termination in the path tracer
    # (variance/throughput tradeoff; the reference PT-walk has none)
    russian_roulette: bool = True
    # Next-event estimation in the path tracer (shadow rays at diffuse
    # vertices + emission-skip on diffuse-scattered rays; the reference's
    # sample_li, light.rs:107-124, ships but is never called)
    nee: bool = False
    # book-3 mixture-PDF importance sampling (ops/mis.py); exclusive with nee
    mis: bool = False
    sppm: SPPMConfig = dataclasses.field(default_factory=SPPMConfig)
    # Intersection strategy: "auto" picks brute force for small scenes and
    # BVH traversal for large ones (threshold below).
    intersector: str = "auto"
    bvh_threshold: int = 4096
    output: str = "output/test.png"
    dtype: str = "float32"

    @staticmethod
    def ci_preset() -> "RenderConfig":
        """Small render for CI (replaces main.rs:42's thread-count shrink —
        on TPU the honest CI reduction is workload size, not parallelism)."""
        return RenderConfig(
            width=200, height=200, samples_per_pixel=16, max_depth=16,
            sppm=SPPMConfig(n_iterations=2, photons_per_iter=20_000),
        )

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)
