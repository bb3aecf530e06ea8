"""Stage breakdown of one reference-scale SPPM iteration (Cornell 800x800,
500k photons/iter) on the real chip — drives VERDICT r2 #6 (target <=1.5 s
steady iteration; round-2 whole-iteration was ~2.25 s).

Stages timed separately (each jitted alone, block_until_ready):
  photon   trace_photon_deposits_soa (emit + bounce wavefront)
  grids    2x build_grid (cell-id argsort + row gathers, global + caustic)
  measure  measurement_soa specular walk (one ray/pixel to first diffuse)
  query    _sorted_dual_query (cell-sort of points + 2 dense kernel queries)
  update   _update_half x2 (elementwise)
Plus the fused whole-iteration time for reference.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from raytracer_tpu.models import sppm
from raytracer_tpu.models.wavefront_soa import trace_photon_deposits_soa
from raytracer_tpu.ops import photon_grid as pg
from raytracer_tpu.scene.builtin import cornell_box

W = H = 800
NPH = 500_000
key = jax.random.PRNGKey(1)
scene = cornell_box(with_mesh=True)
grid_res, _ = pg.choose_grid_resolution(
    scene.bounds_min, scene.bounds_max, NPH, 100)
print("grid_res", grid_res, file=sys.stderr)
skw = dict(width=W, height=H, n_photons=NPH, max_photon_bounces=16,
           max_camera_bounces=50, grid_res=grid_res, k_per_cell=64,
           alpha=0.7, k_global=100, k_caustic=50, t_min=1e-3,
           photon_t_min=1e-4, spawn_eps_rel=1e-4, intersector="auto",
           query_impl="dense")


def timed(label, fn, *a, n=3, **kw):
    out = fn(*a, **kw)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        out = fn(*a, **kw)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    print(f"{label:28s} {best*1e3:8.1f} ms")
    return out


spawn_eps = 1e-4 * scene.scale
k_ph, k_meas = jax.random.split(jax.random.fold_in(key, 0))

# --- photon pass alone
photon_fn = jax.jit(lambda k: trace_photon_deposits_soa(
    scene, k, NPH, 16, 1e-4, spawn_eps, "pallas"))
comps = timed("photon pass (SoA)", photon_fn, k_ph)
(px, py, pz, wr, wg, wb, nx, ny, nz, valid, caustic) = comps
print("deposits", px.shape, "valid", int(valid.sum()),
      "caustic", int((valid & caustic).sum()), file=sys.stderr)


# --- grid builds alone (from materialized components)
@jax.jit
def grids_fn(px, py, pz, wr, wg, wb, nx, ny, nz, valid, caustic):
    pos = jnp.stack([px, py, pz], -1)
    power = jnp.stack([wr, wg, wb], -1)
    norm = jnp.stack([nx, ny, nz], -1)
    g = pg.build_grid(pos, power, norm, valid, scene.bounds_min,
                      scene.bounds_max, grid_res, compact=True)
    c = pg.build_grid(pos, power, norm, valid & caustic, scene.bounds_min,
                      scene.bounds_max, grid_res, compact=True)
    return g, c


g_grid, c_grid = timed("grid builds x2", grids_fn, px, py, pz, wr, wg, wb,
                       nx, ny, nz, valid, caustic)

# --- measurement pass alone
pixel_ids = jnp.arange(W * H, dtype=jnp.int32)
meas_fn = jax.jit(lambda k: sppm.measurement_pass(
    scene, k, pixel_ids, W, H, 50, 1e-3, spawn_eps, "pallas"))
pts = timed("measurement walk", meas_fn, k_meas)

# --- queries alone (first-iteration radii: all cap)
extent = jnp.maximum(scene.bounds_max - scene.bounds_min, 1e-6)
cap_radius = jnp.min(extent / jnp.asarray(grid_res, jnp.float32))
r = jnp.full((W * H,), float(cap_radius), jnp.float32)


@jax.jit
def query_fn(g, c, p, r):
    return sppm._sorted_dual_query(g, c, grid_res, p, r, r, r, r,
                                   scene.bounds_min, scene.bounds_max,
                                   64, 2048, "dense")


qg, qc = timed("dual query (cell-sorted)", query_fn, g_grid, c_grid, pts.p, r)

# --- update alone
st = sppm.init_state(W * H)
upd_fn = jax.jit(lambda st, pts, qg, qc: (
    sppm._update_half(st.glob, pts, qg, 100.0, 0.7, cap_radius),
    sppm._update_half(st.caustic, pts, qc, 50.0, 0.7, cap_radius)))
timed("stat update x2", upd_fn, st, pts, qg, qc)

# --- whole iteration (steady state: run 2 iters, time the 2nd and 3rd)
st = sppm.init_state(W * H)
st = sppm.sppm_iteration(scene, st, key, **skw)
jax.block_until_ready(st.glob.flux)
for i in range(3):
    t0 = time.time()
    st = sppm.sppm_iteration(scene, st, key, **skw)
    jax.block_until_ready(st.glob.flux)
    print(f"whole iteration #{i+2}          {(time.time()-t0)*1e3:8.1f} ms")
