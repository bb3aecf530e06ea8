"""On-chip timing of the estimator flags at production configs: plain PT
vs --nee vs --mis on Cornell (400x400) and scene_500 (800x600), both on
the SoA regen fast path (VERDICT r4 item 5 follow-through)."""
import sys; sys.path.insert(0, "/root/repo")
import time, jax
import numpy as np
from raytracer_tpu.models.path_tracer import render_fn
from raytracer_tpu.scene.builtin import cornell_box
from raytracer_tpu.scene.loader import load_scene

def timed(scene, label, **flags):
    kw = dict(spp=32, spp_chunk=1, max_depth=16, t_min=1e-3,
              spawn_eps_rel=1e-4, intersector="pallas",
              russian_roulette=True, **flags)
    img, rays = render_fn(scene, jax.random.PRNGKey(0), **kw)
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    img, rays = render_fn(scene, jax.random.PRNGKey(1), **kw)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    print(f"{label:28s} {dt:6.3f} s  {int(rays)/dt/1e6:7.2f} Mrays/s  "
          f"mean={float(np.asarray(img).mean()):.5f}", flush=True)

c = cornell_box(with_mesh=True)
s = load_scene("data/scene_500.json", aspect_ratio=800/600)
timed(c, "cornell pt", width=400, height=400)
timed(c, "cornell nee", width=400, height=400, nee=True)
timed(c, "cornell mis", width=400, height=400, mis=True)
timed(s, "scene_500 pt", width=800, height=600)
timed(s, "scene_500 nee", width=800, height=600, nee=True)
timed(s, "scene_500 mis", width=800, height=600, mis=True)
