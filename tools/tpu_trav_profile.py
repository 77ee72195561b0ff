import time, numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.ops.traverse_wide import traverse_wide
from cuda_pathtracer_tpu.ops.traverse import traverse
from cuda_pathtracer_tpu.core.camera import Camera, generate_rays_simple
scene = get_scene('sibenik', asset_dirs=['/root/reference'])
arrays = scene.to_device(); dyn = scene.dynamic_arrays()
print("wide rows:", dyn.wide_rows.shape, "depth:", scene.wide_depth, flush=True)
cam = Camera.create([0.0, -4.0, -14.0], [0.0, 0.05, 1.0], 1.5, 10.0, 0.0)
W,H = 640,480
ys, xs = np.mgrid[0:H, 0:W]
ro, rd = generate_rays_simple(cam, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()), W, H)
ro = jax.device_put(np.asarray(ro)); rd = jax.device_put(np.asarray(rd))

f_wide = jax.jit(lambda ro, rd: traverse_wide(arrays, dyn.wide_rows, scene.wide_depth, ro, rd))
f_narrow = jax.jit(lambda ro, rd: traverse(arrays, dyn.world, ro, rd))
for name, f in [("wide", f_wide), ("narrow", f_narrow)]:
    out = f(ro, rd); _ = np.asarray(out.t[:1])
    t0=time.time()
    out = f(ro, rd); _ = np.asarray(out.t)
    dt = time.time()-t0
    print(f"{name} closest-hit 307k rays: {dt*1000:.0f} ms ({0.3072/dt:.2f} Mrays/s)", flush=True)
# count wide iterations on CPU... instead count with numpy walk quickly on a subsample
