import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, numpy as np, time
from raytracer_tpu.scene.builtin import cornell_box
from raytracer_tpu.models import sppm
from raytracer_tpu.ops import photon_grid as pg

scene = cornell_box(with_mesh=True)
W = H = 400
npix = W*H
key = jax.random.PRNGKey(0)
grid_res, _ = pg.choose_grid_resolution(scene.bounds_min, scene.bounds_max, 250_000, 100)
print('grid_res', grid_res)
for impl in ('dense', 'grid'):
    state = sppm.init_state(npix)
    kw = dict(width=W, height=H, n_photons=250_000, max_photon_bounces=16,
              max_camera_bounces=50, grid_res=grid_res, k_per_cell=64,
              alpha=0.7, k_global=100, k_caustic=50, t_min=1e-3,
              photon_t_min=1e-4, spawn_eps_rel=1e-4, intersector='auto',
              query_impl=impl)
    t0=time.time()
    state = sppm.sppm_iteration(scene, state, key, **kw)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), state)
    print(impl, 'iter1 (compile+run):', round(time.time()-t0,1))
    t0=time.time()
    for _ in range(3):
        state = sppm.sppm_iteration(scene, state, key, **kw)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), state)
    print(impl, 'warm iter:', round((time.time()-t0)/3, 2), 's')
    print(impl, 'mean flux', float(np.abs(np.asarray(state.glob.flux)).mean()),
          'photons', float(np.asarray(state.glob.photons).mean()))
