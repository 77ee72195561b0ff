import time, numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.ops.traverse_wide import traverse_wide
from cuda_pathtracer_tpu.core.camera import Camera, generate_rays_simple
scene = get_scene('sibenik', asset_dirs=['/root/reference'])
arrays = scene.to_device(); dyn = scene.dynamic_arrays()
cam = Camera.create([0.0, -4.0, -14.0], [0.0, 0.05, 1.0], 1.5, 10.0, 0.0)
W,H = 640,480
ys, xs = np.mgrid[0:H, 0:W]
ro, rd = generate_rays_simple(cam, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()), W, H)
ro = jax.device_put(np.asarray(ro)); rd = jax.device_put(np.asarray(rd))
f = jax.jit(lambda ro, rd: traverse_wide(arrays, dyn.wide_rows, scene.wide_depth, ro, rd))
out = f(ro, rd); _ = np.asarray(out.t[:1])
t0=time.time(); out = f(ro, rd); _ = np.asarray(out.t); dt=time.time()-t0
print(f"wide primary 307k: {dt*1000:.0f} ms", flush=True)
# diffuse-like incoherent rays: random directions from hit points
r = np.random.RandomState(0)
pos = np.asarray(ro) + np.asarray(out.t)[:,None]*np.asarray(rd)
nd = r.randn(*pos.shape).astype(np.float32); nd /= np.linalg.norm(nd,axis=1,keepdims=True)
ro2 = jax.device_put(pos.astype(np.float32)); rd2 = jax.device_put(nd)
out2 = f(ro2, rd2); _ = np.asarray(out2.t[:1])
t0=time.time(); out2 = f(ro2, rd2); _ = np.asarray(out2.t); dt=time.time()-t0
print(f"wide incoherent 307k: {dt*1000:.0f} ms", flush=True)
