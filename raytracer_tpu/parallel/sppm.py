"""Multi-chip SPPM: photon all_gather + pixel-sharded measurement/update.

The communication design (SURVEY.md §5.8): each chip traces
photons_per_iter / n_devices photons with a device-unique key, the deposit
arrays are all_gathered over ICI (a few hundred MB/iter at reference scale —
trivially replicable), every chip builds identical photon grids, and the
per-pixel SPPM state lives SHARDED over the "px" axis — it is never
communicated at all. Final gather reuses parallel/render.py's machinery with
the per-pixel estimates riding alongside the sharded pixel ids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from raytracer_tpu.models import sppm as sppm_model
from raytracer_tpu.ops import photon_grid as pg
from raytracer_tpu.scene.types import Scene


@functools.partial(jax.jit, static_argnames=(
    "mesh", "width", "height", "n_photons", "max_photon_bounces",
    "max_camera_bounces", "grid_res", "k_per_cell", "intersector",
    "query_chunk"))
def sppm_iteration_sharded(scene: Scene, state, key, *, mesh: Mesh, width,
                           height, n_photons, max_photon_bounces,
                           max_camera_bounces, grid_res, k_per_cell, alpha,
                           k_global, k_caustic, t_min, photon_t_min,
                           spawn_eps_rel, intersector="auto",
                           query_chunk=2048):
    """One SPPM iteration over the mesh. ``state`` arrays are padded to a
    multiple of the device count and sharded over ("px","spp") flattened."""
    assert mesh.shape["spp"] == 1, (
        "SPPM state is sharded over pixels; use a (n, 1) mesh "
        "(photons already use every device)")
    n_dev = mesh.devices.size
    npix = width * height
    npix_pad = -(-npix // n_dev) * n_dev
    n_ph_local = -(-n_photons // n_dev)
    spawn_eps = spawn_eps_rel * scene.scale
    extent = jnp.maximum(scene.bounds_max - scene.bounds_min, 1e-6)
    cap_radius = jnp.min(extent / jnp.asarray(grid_res, jnp.float32))

    def pad_pix(x):
        return jnp.pad(x, [(0, npix_pad - npix)] + [(0, 0)] * (x.ndim - 1))

    state_p = jax.tree_util.tree_map(
        lambda x: pad_pix(x) if x.ndim and x.shape[0] == npix else x, state)
    pixel_ids = jnp.arange(npix_pad, dtype=jnp.int32)

    def shard_fn(scene_rep, st, key_rep, ids_shard):
        dev = jax.lax.axis_index("px") * mesh.shape["spp"] \
            + jax.lax.axis_index("spp")
        k_iter = jax.random.fold_in(key_rep, st.iteration)
        k_ph = jax.random.fold_in(jax.random.fold_in(k_iter, 101), dev)
        k_meas = jax.random.fold_in(jax.random.fold_in(k_iter, 103), dev)

        # 1. local photon wavefront, then all_gather deposits over ICI
        pos, power, norm, valid, caustic = sppm_model.trace_photon_deposits(
            scene_rep, k_ph, n_ph_local, max_photon_bounces, photon_t_min,
            spawn_eps, intersector)
        # ceil(n_photons/n_dev)*n_dev photons are actually emitted while the
        # final gather normalizes by n_iterations*photons_per_iter — rescale
        # the deposited power so total flux matches exactly n_photons.
        power = power * (n_photons / (n_ph_local * n_dev))
        gather = lambda x: jax.lax.all_gather(
            x, ("px", "spp"), axis=0, tiled=True)
        pos, power, norm = gather(pos), gather(power), gather(norm)
        valid, caustic = gather(valid), gather(caustic)

        # 2. replicated grids (identical on every chip; compact=True matches
        #    the single-chip path's bf16 payloads bit-for-bit)
        g_grid = pg.build_grid(pos, power, norm, valid,
                               scene_rep.bounds_min, scene_rep.bounds_max,
                               grid_res, compact=True)
        c_grid = pg.build_grid(pos, power, norm, valid & caustic,
                               scene_rep.bounds_min, scene_rep.bounds_max,
                               grid_res, compact=True)

        # 3. local measurement points (pixels beyond npix are dead weight)
        pts = sppm_model.measurement_pass(
            scene_rep, k_meas, ids_shard, width, height, max_camera_bounces,
            t_min, spawn_eps, intersector)
        in_image = ids_shard < npix
        pts = pts._replace(valid=pts.valid & in_image)

        # 4. local stat update (state shard never leaves the chip)
        rg = jnp.minimum(jnp.sqrt(jnp.maximum(st.glob.radius2, 0.0)), cap_radius)
        rg = jnp.where(st.glob.photons > 0, rg, cap_radius)
        qg = pg.query_grid_chunked(g_grid, grid_res, pts.p, rg, cap_radius,
                                   k_per_cell, query_chunk)
        glob = sppm_model._update_half(st.glob, pts, qg, k_global, alpha,
                                       cap_radius)
        rc = jnp.minimum(jnp.sqrt(jnp.maximum(st.caustic.radius2, 0.0)),
                         cap_radius)
        rc = jnp.where(st.caustic.photons > 0, rc, cap_radius)
        qc = pg.query_grid_chunked(c_grid, grid_res, pts.p, rc, cap_radius,
                                   k_per_cell, query_chunk)
        caus = sppm_model._update_half(st.caustic, pts, qc, k_caustic, alpha,
                                       cap_radius)
        return sppm_model.SPPMState(glob, caus, st.iteration + 1)

    state_spec = sppm_model.SPPMState(
        glob=sppm_model.SPPMHalf(P("px"), P("px"), P("px")),
        caustic=sppm_model.SPPMHalf(P("px"), P("px"), P("px")),
        iteration=P())
    out = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), state_spec, P(), P("px")),
        out_specs=state_spec,
        check_vma=False,
    )(scene, state_p, key, pixel_ids)
    return jax.tree_util.tree_map(
        lambda x: x[:npix] if x.ndim and x.shape[0] == npix_pad else x, out)
