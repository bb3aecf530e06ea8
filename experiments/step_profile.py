"""Per-bounce step cost breakdown (round-4 VERDICT item 2).

Times a fori_loop of K steps for progressively larger slices of the regen
bounce body, at the headline wavefront width, on scene_500 (1005 spheres)
and scene_10 (25 spheres). Each slice's carry depends on the previous
step's outputs so XLA cannot hoist work out of the loop. Differences
between consecutive slices attribute the step cost:

  kernel        : pallas intersect (_run) only
  +attrs        : + attrs_soa (winner decode)
  +scatter      : + scatter_soa (texture + scatter draws)
  +accum+rr     : + radiance accumulation + russian roulette + cont masks
  +regen        : + camera_rays_soa respawn + drain bookkeeping (full body)
  render        : the real render_regen_soa, per executed step

Usage: python experiments/step_profile.py [n_lanes] [K]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from raytracer_tpu.models import wavefront_soa as ws
from raytracer_tpu.scene.loader import load_scene


def timed(fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    return out, time.perf_counter() - t0


def profile_scene(path, n, k_steps, width=800, height=600):
    scene = load_scene(path, aspect_ratio=width / height)
    key = jax.random.PRNGKey(0)
    from raytracer_tpu.ops.pallas_intersect import _run as prun

    pix = jnp.arange(n, dtype=jnp.int32) % (width * height)
    px = (pix % width).astype(jnp.float32)
    py = (pix // width).astype(jnp.float32)
    ox, oy, oz, dx, dy, dz = ws.camera_rays_soa(
        scene.camera, key, px, py, width, height)
    alive = ox == ox

    def mk_loop(body):
        @jax.jit
        def run(ox, oy, oz, dx, dy, dz):
            def f(i, c):
                return body(i, *c)
            return jax.lax.fori_loop(0, k_steps, f,
                                     (ox, oy, oz, dx, dy, dz))
        return run

    def dep(t, ox, oy, oz, dx, dy, dz):
        # fold a data dependency on t into the rays without changing them
        # numerically (1e-30 + typical ox magnitudes underflows the add);
        # both where-branches differing keeps XLA from constant-folding it
        eps = jnp.where(jnp.isfinite(t), 1e-30, 2e-30)
        return ox + eps, oy, oz, dx, dy, dz

    def body_rng(i, ox, oy, oz, dx, dy, dz):
        # the step's full threefry budget alone: scatter's 5 + RR's 1 +
        # camera respawn's 5 uniforms over n
        k = jax.random.fold_in(key, i)
        u = jax.random.uniform(k, (ws.U_REGEN_ROWS, n)).sum(axis=0)
        u = u + jax.random.uniform(jax.random.fold_in(k, 37), (n,))
        spawn_k = jax.random.fold_in(jax.random.fold_in(key, 7), i + 1)
        cox, coy, coz, cdx, cdy, cdz = ws.camera_rays_soa(
            scene.camera, spawn_k, px, py, width, height)
        return dep(u + cox + cdx, ox, oy, oz, dx, dy, dz)

    def body_kernel(i, ox, oy, oz, dx, dy, dz):
        o3 = jnp.stack([ox, oy, oz], -1)
        d3 = jnp.stack([dx, dy, dz], -1)
        t, ty, _ix, data = prun(scene, o3, d3, 1e-3, jnp.inf, alive=alive)
        return dep(t, ox, oy, oz, dx, dy, dz)

    def body_attrs(i, ox, oy, oz, dx, dy, dz):
        o3 = jnp.stack([ox, oy, oz], -1)
        d3 = jnp.stack([dx, dy, dz], -1)
        t, ty, _ix, data = prun(scene, o3, d3, 1e-3, jnp.inf, alive=alive)
        h, f = ws.attrs_soa(ox, oy, oz, dx, dy, dz, t, ty, data)
        s = (h.t + h.px + h.py + h.pz + h.nx + h.ny + h.nz + h.u + h.v
             + f.fuzz + f.c0r + f.kind)
        return dep(s, ox, oy, oz, dx, dy, dz)

    def body_scatter(i, ox, oy, oz, dx, dy, dz):
        k = jax.random.fold_in(key, i)
        b = ws.bounce_step(scene, k, ox, oy, oz, dx, dy, dz, alive,
                           t_min=1e-3, spawn_eps=1e-4 * scene.scale,
                           intersector="pallas", fused=False)
        s = (b.ndx + b.ndy + b.ndz + b.nox + b.noy + b.noz + b.ar + b.ag
             + b.ab + b.er + b.eg + b.eb + b.inter)
        return dep(s, ox, oy, oz, dx, dy, dz)

    def body_fused(i, ox, oy, oz, dx, dy, dz):
        # the fused megakernel replacing kernel+attrs+scatter in one call
        k = jax.random.fold_in(key, i)
        b = ws.bounce_step(scene, k, ox, oy, oz, dx, dy, dz, alive,
                           t_min=1e-3, spawn_eps=1e-4 * scene.scale,
                           intersector="pallas", fused=True)
        s = (b.ndx + b.ndy + b.ndz + b.nox + b.noy + b.noz + b.ar + b.ag
             + b.ab + b.er + b.eg + b.eb + b.inter)
        return dep(s, ox, oy, oz, dx, dy, dz)

    def body_accum(i, ox, oy, oz, dx, dy, dz):
        k = jax.random.fold_in(key, i)
        b = ws.bounce_step(scene, k, ox, oy, oz, dx, dy, dz, alive,
                           t_min=1e-3, spawn_eps=1e-4 * scene.scale,
                           intersector="pallas", fused=False)
        tr = jnp.abs(dx)
        sr = tr * b.er + tr * b.eg + tr * b.eb
        cont = alive & (b.inter != 0)
        p_surv = jnp.clip(jnp.maximum(b.ar, jnp.maximum(b.ag, b.ab)),
                          0.05, 1.0)
        u = jax.random.uniform(jax.random.fold_in(k, 37), (n,))
        cont = cont & (u < p_surv)
        ox2 = jnp.where(cont, b.nox, ox + sr * 0.0)
        dy2 = jnp.where(cont, b.ndy, dy)
        return ox2, oy, oz, dx, dy2, dz

    def body_full(i, ox, oy, oz, dx, dy, dz):
        k = jax.random.fold_in(key, i)
        b = ws.bounce_step(scene, k, ox, oy, oz, dx, dy, dz, alive,
                           t_min=1e-3, spawn_eps=1e-4 * scene.scale,
                           intersector="pallas", fused=False)
        tr = jnp.abs(dx)
        sr = tr * b.er + tr * b.eg + tr * b.eb
        cont = alive & (b.inter != 0)
        p_surv = jnp.clip(jnp.maximum(b.ar, jnp.maximum(b.ag, b.ab)),
                          0.05, 1.0)
        u = jax.random.uniform(jax.random.fold_in(k, 37), (n,))
        cont = cont & (u < p_surv)
        spawn_k = jax.random.fold_in(jax.random.fold_in(key, 7), i + 1)
        cox, coy, coz, cdx, cdy, cdz = ws.camera_rays_soa(
            scene.camera, spawn_k, px, py, width, height)
        regen = ~cont
        ox2 = jnp.where(regen, cox, jnp.where(cont, b.nox, ox + sr * 0.0))
        oy2 = jnp.where(regen, coy, jnp.where(cont, b.noy, oy))
        oz2 = jnp.where(regen, coz, jnp.where(cont, b.noz, oz))
        dx2 = jnp.where(regen, cdx, jnp.where(cont, b.ndx, dx))
        dy2 = jnp.where(regen, cdy, jnp.where(cont, b.ndy, dy))
        dz2 = jnp.where(regen, cdz, jnp.where(cont, b.ndz, dz))
        return ox2, oy2, oz2, dx2, dy2, dz2

    rows = {}
    for name, body in [("rng_only", body_rng), ("kernel", body_kernel),
                       ("+attrs", body_attrs),
                       ("+scatter", body_scatter),
                       ("fused_bounce", body_fused),
                       ("+accum+rr", body_accum),
                       ("+regen(full)", body_full)]:
        run = mk_loop(body)
        _, dt = timed(run, ox, oy, oz, dx, dy, dz)
        rows[name] = dt / k_steps * 1e3

    # the real renderer, per executed while_loop step
    @jax.jit
    def real():
        return ws.render_regen_soa(
            scene, key, width=width, height=height, lanes_per_pixel=1,
            samples_per_lane=4, max_depth=16, t_min=1e-3,
            spawn_eps=1e-4 * scene.scale, intersector="pallas",
            russian_roulette=True)
    (accum, rays, steps), dt = timed(real)
    rows["render/step"] = dt / int(steps) * 1e3
    rows["render_steps"] = int(steps)
    rows["render_rays"] = int(rays)
    rows["render_s"] = dt
    return rows


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 480_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    for path in ["data/scene_500.json", "data/scene_10.json"]:
        rows = profile_scene(path, n, k)
        print(f"== {path} n={n} K={k} (ms/step) ==")
        prev = 0.0
        for name in ["rng_only", "kernel", "+attrs", "+scatter",
                     "fused_bounce", "+accum+rr", "+regen(full)"]:
            d = rows[name]
            print(f"  {name:14s} {d:8.2f}  (delta {d - prev:+7.2f})")
            prev = d
        print(f"  render/step    {rows['render/step']:8.2f}  "
              f"steps={rows['render_steps']} rays={rows['render_rays']} "
              f"total={rows['render_s']:.3f}s")


if __name__ == "__main__":
    main()
