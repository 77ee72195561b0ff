import time, numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.models.pathtracer import Pathtracer
from cuda_pathtracer_tpu.core.camera import Camera
scene = get_scene('sibenik', asset_dirs=['/root/reference'])
cam = Camera.create([0.0, -4.0, -14.0], [0.0, 0.05, 1.0], 1.5, 10.0, 0.0)
W,H = 640,480
pt = Pathtracer(scene, W, H)
pt.render(cam, should_clear=True)
_ = np.asarray(pt.lum[0])   # force
print("interactive done", flush=True)
t0=time.time()
pt.render(cam, should_clear=False)
_ = np.asarray(pt.lum[0])
print(f"converge first (incl compile): {time.time()-t0:.1f}s", flush=True)
for i in range(6):
    t0=time.time()
    pt.render(cam, should_clear=False)
    _ = np.asarray(pt.lum[0])
    print(f"sample {i}: {(time.time()-t0)*1000:.0f} ms", flush=True)
t0=time.time()
rays0 = float(pt.rays_traced)
print(f"rays read: {(time.time()-t0)*1000:.0f} ms, {rays0/1e6:.2f}M", flush=True)
t0=time.time()
N=8
for i in range(N):
    pt.render(cam, should_clear=False)
rays1 = float(pt.rays_traced)   # forces the chain
dt=time.time()-t0
print(f"batch of {N}: {dt/N*1000:.0f} ms/sample -> {(rays1-rays0)/dt/1e6:.1f} Mrays/s", flush=True)
