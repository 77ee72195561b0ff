import time, numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.models.pathtracer import Pathtracer
from cuda_pathtracer_tpu.core.camera import Camera
scene = get_scene('sibenik', asset_dirs=['/root/reference'])
cam = Camera.create([0.0, -4.0, -14.0], [0.0, 0.05, 1.0], 1.5, 10.0, 0.0)
for W,H in [(1280,720),(1920,1080)]:
    try:
        pt = Pathtracer(scene, W, H)
        t0=time.time(); pt.render(cam, should_clear=True)
        v = float(pt.rays_traced)
        print(f"{W}x{H} interactive OK {time.time()-t0:.1f}s rays={v/1e6:.2f}M", flush=True)
        t0=time.time(); pt.render(cam, should_clear=False)
        v = float(pt.rays_traced)
        print(f"{W}x{H} converge OK {time.time()-t0:.1f}s rays={v/1e6:.2f}M", flush=True)
    except Exception as e:
        print(f"{W}x{H} FAIL: {str(e)[:100]}", flush=True)
