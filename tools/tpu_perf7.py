import time, numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.models.pathtracer import Pathtracer
from cuda_pathtracer_tpu.core.camera import Camera
scene = get_scene('sibenik', asset_dirs=['/root/reference'])
cam = Camera.create([0.0, -4.0, -14.0], [0.0, 0.05, 1.0], 1.5, 10.0, 0.0)
W,H = 640,480
pt = Pathtracer(scene, W, H)
t0=time.time(); pt.render(cam, should_clear=True); pt.finish(); print(f"interactive {time.time()-t0:.1f}s", flush=True)
for i in range(10):
    t0=time.time()
    pt.render(cam, should_clear=False)
    pt.finish()
    print(f"sample {i}: {(time.time()-t0)*1000:.0f} ms", flush=True)
r = float(pt.rays_traced)
print(f"rays total {r/1e6:.2f}M over {pt.sample_idx} samples", flush=True)
