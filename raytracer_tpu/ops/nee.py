"""Next-event estimation / direct light sampling — the reference's
``Light::sample_li`` (light.rs:107-124 sphere, :170-183 rect; summed over
lights by AllLights::sample_li, light.rs:229-234).

NOTE: the reference never calls sample_li from its active integrator (SPPM
covers direct lighting via photons + emission) — this ships for capability
parity and for a PT+NEE mode. Reference quirks preserved: shadow rays start
exactly at the surface point with the (1e-4, t-1e-4) window; each light's
estimate is averaged over its own samples then *summed* over lights (no
selection pdf); the contribution is flux ⊙ bsdf * max(0, n·dir) with no
distance falloff (the reference's /r^2 term is commented out, light.rs:120).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracer_tpu.ops import materials as mat_ops
from raytracer_tpu.ops import sampling, vec
from raytracer_tpu.ops.dispatch import intersect_scene
from raytracer_tpu.ops.intersect import HitAttrs
from raytracer_tpu.scene.types import LIGHT_SPHERE, Scene


def sample_li(scene: Scene, key, attrs: HitAttrs, n_samples: int = 4,
              intersector: str = "auto"):
    """Direct radiance at each shading point: (N, 3)."""
    n = attrs.p.shape[0]
    n_lights = scene.lights.kind.shape[0]
    if n_lights == 0:
        return jnp.zeros((n, 3), jnp.float32)
    bsdf_color = mat_ops.bsdf(scene, attrs.mat_id, attrs.p, attrs.uv)
    total = jnp.zeros((n, 3), jnp.float32)

    for li in range(n_lights):
        kind = scene.lights.kind[li]
        p0 = scene.lights.p0[li]
        p1 = scene.lights.p1[li]
        r0 = scene.lights.r0[li]
        flux = scene.lights.flux[li]
        acc = jnp.zeros((n, 3), jnp.float32)
        for s in range(n_samples):
            k = jax.random.fold_in(jax.random.fold_in(key, li), s)
            k1, k2 = jax.random.split(k)
            # sphere light: hemisphere toward the shading point
            # (light.rs:110-113)
            center_to_p = vec.unit(attrs.p - p0[None])
            sph_pt = p0[None] + sampling.uniform_hemisphere(
                k1, center_to_p) * r0
            # rect light: uniform point on the area (light.rs:148-154)
            uv = jax.random.uniform(k2, (n, 2))
            rect_pt = jnp.stack([
                p0[0] + (p1[0] - p0[0]) * uv[:, 0],
                jnp.broadcast_to(p0[1], (n,)),
                p0[2] + (p1[2] - p0[2]) * uv[:, 1],
            ], axis=-1)
            point = jnp.where(kind == LIGHT_SPHERE, sph_pt, rect_pt)
            to_light = point - attrs.p
            dist = jnp.sqrt(vec.dot(to_light, to_light))
            dir_ = to_light / jnp.maximum(dist, 1e-12)[:, None]
            hit = intersect_scene(scene, attrs.p, dir_, 1e-4,
                                  jnp.maximum(dist - 1e-4, 1e-4), intersector)
            visible = ~jnp.isfinite(hit.t)
            cos_term = jnp.maximum(vec.dot(attrs.normal, dir_), 0.0)
            contrib = flux[None] * bsdf_color * cos_term[:, None]
            acc = acc + jnp.where((visible & attrs.valid)[:, None], contrib, 0.0)
        total = total + acc / n_samples
    return total
