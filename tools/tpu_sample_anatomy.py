"""Anatomy of a real converge sample: time render_sample at one 1080p band
for increasing max_bounces (and toggles) to locate the cost."""
import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.core.camera import Camera
from cuda_pathtracer_tpu.models.pathtracer import render_sample
from cuda_pathtracer_tpu.models import film
from cuda_pathtracer_tpu.models.guiding import init_radiance_state

scene = get_scene('sibenik', asset_dirs=['/root/reference', '.'])
arrays, dyn = scene.to_device(), scene.dynamic_arrays()
cam = Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
W, H = 1920, 216
B = W * H
radiance = init_radiance_state(int(arrays.tri_mat.shape[0]))
lum, alb = film.clear_accumulators(B)
wd = -(-scene.wide_depth // 4) * 4

def run(name, **kw):
    args = dict(nee=True, cache_on=True, max_bounces=32, width=W, height=H,
                full_height=1080, wide_depth=wd, tile_order=True)
    args.update(kw)
    f = lambda: render_sample(arrays, dyn, cam, radiance, lum, alb,
                              jnp.uint32(1), jnp.uint32(7), jnp.asarray(True),
                              **args)
    out = f(); out[0].block_until_ready()
    best = 1e9
    for _ in range(3):
        s = time.perf_counter()
        out = f()
        out[0].block_until_ready()
        _ = np.asarray(out[0][:1])
        best = min(best, time.perf_counter() - s)
    print(f'{name}: {best*1e3:8.1f} ms  rays={float(out[4])/1e6:.2f}M '
          f'-> {float(out[4])/best/1e6:6.2f} Mrays/s')

run('mb=1          ', max_bounces=1)
run('mb=2          ', max_bounces=2)
run('mb=3          ', max_bounces=3)
run('mb=4 (tail on)', max_bounces=4)
run('mb=8          ', max_bounces=8)
run('mb=32         ', max_bounces=32)
run('mb=32 no-nee  ', max_bounces=32, nee=False)
run('mb=32 no-cache', max_bounces=32, cache_on=False)
run('mb=3 no-nee   ', max_bounces=3, nee=False)
