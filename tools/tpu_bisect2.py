import time, numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.models.pathtracer import Pathtracer, render_sample
from cuda_pathtracer_tpu.models import film
from cuda_pathtracer_tpu.models.guiding import init_radiance_state
from cuda_pathtracer_tpu.core.camera import Camera
scene = get_scene('sibenik', asset_dirs=['/root/reference'])
cam = Camera.create([0.0, -4.0, -14.0], [0.0, 0.05, 1.0], 1.5, 10.0, 0.0)
W,H = 640,480
arrays = scene.to_device(); dyn = scene.dynamic_arrays()
radiance = init_radiance_state(int(arrays.tri_mat.shape[0]))
for mb in [1, 2, 4, 8, 16, 32]:
    lum, alb = film.clear_accumulators(W*H)
    try:
        t0=time.time()
        out = render_sample(arrays, dyn, cam, radiance, lum, alb,
                            jnp.asarray(1, jnp.uint32), jnp.asarray(0, jnp.uint32),
                            jnp.asarray(False),
                            nee=True, cache_on=True, max_bounces=mb, width=W, height=H)
        v = np.asarray(out[0])
        print(f"mb={mb}: OK {time.time()-t0:.1f}s mean={v[:, :3].mean():.4f} rays={float(out[4])/1e6:.2f}M", flush=True)
    except Exception as e:
        print(f"mb={mb}: FAIL {str(e)[:120]}", flush=True)
        break
