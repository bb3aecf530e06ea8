import sys; sys.path.insert(0, "/root/repo")
import time, jax
import jax.numpy as jnp
from raytracer_tpu.models import path_tracer as pt
from raytracer_tpu.scene.loader import load_scene

scene = load_scene("data/scene_500.json", aspect_ratio=800/600)
key = jax.random.PRNGKey(1)
kw = dict(width=800, height=600, spp=50, spp_chunk=1, max_depth=16,
          t_min=1e-3, spawn_eps_rel=1e-4, intersector="pallas",
          russian_roulette=True)
warm, wrays = pt.render_fn(scene, key, **kw)
jax.block_until_ready(warm)
t0=time.time()
img50, r50 = pt.render_fn(scene, key, **kw)
jax.block_until_ready(img50)
print("single 50spp dispatch:", round(time.time()-t0,3), "s", flush=True)

# phase A: 20 render_fn dispatches back-to-back, same key, block at end
t0=time.time()
outs = []
for i in range(20):
    img, rays = pt.render_fn(scene, key, **kw)
    outs.append((img, rays))
jax.block_until_ready(outs[-1][0])
print("A 20x render_fn same-key, block last:", round(time.time()-t0,1), flush=True)
# phase A2: block every output (were they all done?)
t0=time.time()
jax.block_until_ready(outs)
print("A2 block all:", round(time.time()-t0,1), flush=True)
# phase B: 20 int() transfers of ready scalars
t0=time.time()
tot = sum(int(r) for (_, r) in outs)
print("B 20x int(rays):", round(time.time()-t0,1), "tot", tot, flush=True)
# phase C: keys gather + accum per batch interleaved (the new render loop shape)
keys = jax.vmap(lambda i: jax.random.fold_in(key, 1000 + i))(jnp.arange(20))
accum = jnp.zeros((600, 800, 3), jnp.float32)
t0=time.time()
br = []
for i in range(20):
    img, rays = pt.render_fn(scene, keys[i], **kw)
    accum = pt._accum_batch(accum, img, 0.05)
    br.append(rays)
jax.block_until_ready(accum)
print("C interleaved loop:", round(time.time()-t0,1), flush=True)
t0=time.time()
import numpy as np
tot = int(np.asarray(jax.device_get(jnp.stack(br)), dtype=np.int64).sum())
print("D one stacked rays transfer:", round(time.time()-t0,2), "tot", tot, flush=True)
