import sys; sys.path.insert(0, "/root/repo")
import time, jax
from raytracer_tpu.models import path_tracer as pt
from raytracer_tpu.scene.builtin import cornell_smoke, cornell_box

def _timed(fn, *args, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    return out, time.time() - t0

key = jax.random.PRNGKey(1)
kw_sm = dict(width=400, height=400, spp=32, spp_chunk=4, max_depth=16,
             t_min=1e-3, spawn_eps_rel=1e-4)
(img_sm, _), dt_smoke = _timed(pt.render_fn, cornell_smoke(), key, **kw_sm)
print("smoke:", round(dt_smoke,3))
(img_cb, _), dt_cb = _timed(pt.render_fn, cornell_box(), key, **kw_sm)
print("cornell:", round(dt_cb,3), " tax:", round(dt_smoke/dt_cb,2))
