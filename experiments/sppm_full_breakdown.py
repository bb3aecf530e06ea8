"""Phase breakdown of THE reference workload (VERDICT r4 item 9 prep):
Cornell 800x800, 50 SPPM iterations x 500k photons, 256-spp depth-50
gather — where do the ~157 s (BENCH_r04 sppm_full_800_s) go?

The steady-state numbers say they shouldn't: iteration 0.29 s x 50 =
14.5 s, and the gather is a regen specular walk that should run at
PT-Cornell speed (~5-10 s for 163.8M primaries). The suspects are
compile time (blocked-iteration + gather programs compile INSIDE the
timed region; bench.py's warmup runs the UNBLOCKED iteration, a
different program) and host-batch overheads.

Phases timed: iterations (50, pipelined), gather dispatch 1 (cold,
includes its compile), remaining gather dispatches (warm).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from raytracer_tpu.models import sppm
from raytracer_tpu.ops import photon_grid as pg
from raytracer_tpu.scene.builtin import cornell_box
from raytracer_tpu.utils.config import RenderConfig

cfg = RenderConfig()
scene = cornell_box(with_mesh=True)
sp = cfg.sppm
npix = cfg.width * cfg.height
key = jax.random.PRNGKey(9)

grid_res, _ = pg.choose_grid_resolution(
    scene.bounds_min, scene.bounds_max, sp.photons_per_iter, sp.k_global)
kw = dict(width=cfg.width, height=cfg.height,
          n_photons=sp.photons_per_iter,
          max_photon_bounces=sp.max_photon_bounces,
          max_camera_bounces=sp.max_camera_bounces,
          grid_res=grid_res, k_per_cell=sp.max_photons_per_cell,
          alpha=sp.alpha, k_global=sp.k_global, k_caustic=sp.k_caustic,
          t_min=cfg.t_min, photon_t_min=1e-4,
          spawn_eps_rel=cfg.spawn_eps_rel,
          intersector=cfg.intersector, query_impl=sp.query_impl)

t_all = time.perf_counter()
state = sppm.init_state(npix)
t0 = time.perf_counter()
state = sppm.sppm_iteration_blocked(scene, state, key,
                                    pixel_block=sp.pixel_block, **kw)
jax.block_until_ready(state.glob.flux)
t_iter_cold = time.perf_counter() - t0
t0 = time.perf_counter()
for _ in range(1, sp.n_iterations):
    state = sppm.sppm_iteration_blocked(scene, state, key,
                                        pixel_block=sp.pixel_block, **kw)
jax.block_until_ready(state.glob.flux)
t_iter_warm = time.perf_counter() - t0
print(f"iter 1 (cold, incl compiles): {t_iter_cold:7.2f} s", flush=True)
print(f"iters 2-50 (warm, pipelined): {t_iter_warm:7.2f} s "
      f"({t_iter_warm / (sp.n_iterations - 1):.3f} s/iter)", flush=True)

# gather, batched exactly like sppm.render
n_total = sp.n_iterations * sp.photons_per_iter
total = cfg.samples_per_pixel
batch, chunk_budget = sppm.gather_batching(cfg, npix)
print(f"gather batch={batch} spp_chunk="
      f"{max(1, min(cfg.spp_chunk, batch, chunk_budget))} "
      f"dispatches={-(-total // batch)}", flush=True)
done, i = 0, 0
while done < total:
    spp = min(batch, total - done)
    t0 = time.perf_counter()
    img, rays = sppm.gather_fn(
        scene, state, jax.random.fold_in(jax.random.fold_in(key, 23), i),
        width=cfg.width, height=cfg.height, spp=spp,
        spp_chunk=max(1, min(cfg.spp_chunk, spp, chunk_budget)),
        max_depth=cfg.max_depth, t_min=cfg.t_min,
        spawn_eps_rel=cfg.spawn_eps_rel, n_total_photons=n_total,
        intersector=cfg.intersector)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    tag = "cold" if i == 0 else "warm"
    print(f"gather dispatch {i:2d} ({spp:3d} spp, {tag}): {dt:7.2f} s "
          f"({int(rays) / dt / 1e6:6.1f} Mrays/s)", flush=True)
    done += spp
    i += 1
print(f"TOTAL: {time.perf_counter() - t_all:.1f} s", flush=True)
