import time, numpy as np, jax
print("devices:", jax.devices(), flush=True)
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.models.pathtracer import Pathtracer
from cuda_pathtracer_tpu.core.camera import Camera
scene = get_scene('sibenik', asset_dirs=['/root/reference'])
cam = Camera.create([0.0, -4.0, -14.0], [0.0, 0.05, 1.0], 1.5, 10.0, 0.0)
pt = Pathtracer(scene, 640, 480)
pt.render(cam, should_clear=True); pt.finish()
print("interactive ok", flush=True)
pt.render(cam, should_clear=False)
for name in ['lum', 'alb']:
    t0=time.time()
    v = np.asarray(getattr(pt, name))
    print(name, "ok", v.shape, f"{time.time()-t0:.1f}s mean={v.mean():.4f}", flush=True)
t0=time.time()
print("radiance cache:", np.asarray(pt.radiance.cache).mean(), f"{time.time()-t0:.1f}s", flush=True)
t0=time.time()
print("rand_idx:", int(pt.rand_idx), f"{time.time()-t0:.1f}s", flush=True)
t0=time.time()
print("rays:", float(pt.rays_traced), f"{time.time()-t0:.1f}s", flush=True)
