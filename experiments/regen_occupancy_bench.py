"""Occupancy vs lane count for the regen PT wavefront (scene_500 800x600).

The regen loop's tail = lanes finishing their per-lane sample quotas at
different times; fewer lanes x more samples-per-lane amortizes the tail
over more steps (CLT: tail ~ sqrt(q)*sd_len vs total ~ q*E_len) at the
price of a smaller wavefront. Measures wall-clock + steps for
spp_chunk (=lanes_per_pixel) in {1, 2, 4} at spp=32, RR on and off.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
from raytracer_tpu.models import path_tracer as pt
from raytracer_tpu.scene.loader import load_scene

W, H, SPP = 800, 600, 32
scene = load_scene("data/scene_500.json", aspect_ratio=W / H)
key = jax.random.PRNGKey(1)

for rr in (True, False):
    for chunk in (1, 2, 4):
        kw = dict(width=W, height=H, spp=SPP, spp_chunk=chunk, max_depth=16,
                  t_min=1e-3, spawn_eps_rel=1e-4, intersector="pallas",
                  russian_roulette=rr)
        img, rays = pt.render_fn(scene, key, **kw)
        jax.block_until_ready(img)
        best = 1e9
        for _ in range(2):
            t0 = time.time()
            img, rays = pt.render_fn(scene, key, **kw)
            jax.block_until_ready(img)
            best = min(best, time.time() - t0)
        print(f"rr={rr} lanes/px={chunk} ({chunk*W*H/1e6:.2f}M lanes): "
              f"{best:6.2f} s  {int(rays)/best/1e6:6.2f} Mrays/s")
