import time, numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
print("devices:", jax.devices(), flush=True)
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.models.pathtracer import render_sample
from cuda_pathtracer_tpu.models import film
from cuda_pathtracer_tpu.models.guiding import init_radiance_state
from cuda_pathtracer_tpu.core.camera import Camera
scene = get_scene('sibenik', asset_dirs=['/root/reference'])
cam = Camera.create([0.0, -4.0, -14.0], [0.0, 0.05, 1.0], 1.5, 10.0, 0.0)
W,H = 640,480
arrays = scene.to_device(); dyn = scene.dynamic_arrays()
radiance = init_radiance_state(int(arrays.tri_mat.shape[0]))
for mb in [2, 8]:
    lum, alb = film.clear_accumulators(W*H)
    args = (arrays, dyn, cam, radiance, lum, alb,
            jnp.asarray(1, jnp.uint32), jnp.asarray(0, jnp.uint32), jnp.asarray(False))
    kw = dict(nee=True, cache_on=True, max_bounces=mb, width=W, height=H)
    t0=time.time(); out = render_sample(*args, **kw); out[0].block_until_ready()
    print(f"mb={mb}: compile+run {time.time()-t0:.1f}s", flush=True)
    t0=time.time()
    N=5
    for i in range(N):
        out = render_sample(*args, **kw)
    out[0].block_until_ready()
    dt=(time.time()-t0)/N
    print(f"mb={mb}: run {dt*1000:.0f} ms/sample -> {float(out[4])/dt/1e6:.1f} Mrays/s", flush=True)
