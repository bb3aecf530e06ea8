"""Final timing of BASELINE.md's literal metric through bench.py's exact
code path: warm via pt.render (2 batches of 50 spp -> compiles render_fn,
the fixed-shape key table, and the jitted accumulate), then time the
1000-spp 800x600 scene_500 render."""
import sys; sys.path.insert(0, "/root/repo")
import time, jax
from raytracer_tpu.models import path_tracer as pt
from raytracer_tpu.scene.loader import load_scene
from raytracer_tpu.utils.config import RenderConfig

scene = load_scene("data/scene_500.json", aspect_ratio=800/600)
key = jax.random.PRNGKey(1)
warm, _ = pt.render(scene, RenderConfig(width=800, height=600,
                    samples_per_pixel=100, max_depth=16, spp_chunk=1,
                    host_spp_batch=50, intersector="pallas"), key)
jax.block_until_ready(warm)
print("warm done", flush=True)
t0 = time.time()
img, rays = pt.render(scene, RenderConfig(width=800, height=600,
                      samples_per_pixel=1000, max_depth=16, spp_chunk=1,
                      host_spp_batch=50, intersector="pallas"), key)
jax.block_until_ready(img)
print("s_to_1000spp_measured:", round(time.time()-t0, 1), "rays", rays, flush=True)
