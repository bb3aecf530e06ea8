"""Perlin gradient noise + turbulence (batched, branch-free).

The reference has NO Perlin noise (SURVEY.md §8 — grep-verified), but the
driver's benchmark configs name it, so it ships as a texture extension:
classic lattice gradient noise with hermitian smoothing and the book-2
marble pattern 0.5*(1 + sin(scale*z + 10*turb(p))).

The permutation/gradient tables are fixed module constants (deterministic),
folded into compiled programs as literals.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# NB: plain numpy, NOT jnp — this module is imported lazily, sometimes
# inside an active jit trace, and jnp.asarray would stage a convert op whose
# tracer then leaks via these module globals (UnexpectedTracerError on the
# next trace). numpy constants are safely closed over by any trace.
_rng = np.random.default_rng(12345)
_PERM_X = _rng.permutation(256).astype(np.int32)
_PERM_Y = _rng.permutation(256).astype(np.int32)
_PERM_Z = _rng.permutation(256).astype(np.int32)
_g = _rng.normal(size=(256, 3))
_GRAD = (_g / np.linalg.norm(_g, axis=-1, keepdims=True)).astype(np.float32)


def perlin(p):
    """Gradient noise in [-1, 1]-ish for points p (..., 3)."""
    # localize table constants per trace (see module note)
    perm_x = jnp.asarray(_PERM_X)
    perm_y = jnp.asarray(_PERM_Y)
    perm_z = jnp.asarray(_PERM_Z)
    grad = jnp.asarray(_GRAD)
    ip = jnp.floor(p)
    f = p - ip
    u = f * f * (3.0 - 2.0 * f)                       # hermitian smoothing
    i = ip.astype(jnp.int32)

    acc = jnp.zeros(p.shape[:-1], p.dtype)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                h = (perm_x[(i[..., 0] + dx) & 255]
                     ^ perm_y[(i[..., 1] + dy) & 255]
                     ^ perm_z[(i[..., 2] + dz) & 255])
                g = grad[h]                           # (..., 3)
                w = (f - jnp.asarray([dx, dy, dz], p.dtype))
                dot = jnp.sum(g * w, axis=-1)
                wx = u[..., 0] if dx else (1.0 - u[..., 0])
                wy = u[..., 1] if dy else (1.0 - u[..., 1])
                wz = u[..., 2] if dz else (1.0 - u[..., 2])
                acc = acc + wx * wy * wz * dot
    return acc


def turbulence(p, depth: int = 7):
    """Sum of |noise| octaves."""
    acc = jnp.zeros(p.shape[:-1], p.dtype)
    weight = 1.0
    q = p
    for _ in range(depth):
        acc = acc + weight * jnp.abs(perlin(q))
        weight *= 0.5
        q = q * 2.0
    return acc


def marble(p, scale):
    """Book-2 marble: 0.5*(1 + sin(scale*z + 10*turb(p)))."""
    return 0.5 * (1.0 + jnp.sin(scale * p[..., 2] + 10.0 * turbulence(p)))
