"""Direct cost of the tail levels: one band-sample at max_bounces=3 (tail
statically absent) vs 32 (both tail levels), identical everything else.
Timing by K pipelined calls, honest final transfer.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/tail_cost.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(__file__) + '/..')

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
SPP = int(os.environ.get('PROF_SPP', '1'))


def mk(mb):
    @jax.jit
    def f(ridx):
        return render_sample(arrays, dyn, cam, radiance, lum, alb,
                             jnp.uint32(1), ridx, jnp.asarray(True),
                             nee=True, cache_on=True, max_bounces=mb,
                             width=W, height=H, full_height=1080,
                             wide_depth=wd, tile_order=True, spp=SPP)
    return f


res = {}
for mb in [3, 14, 32]:
    f = mk(mb)
    out = f(jnp.uint32(7))
    out[0].block_until_ready()
    _ = np.asarray(out[0][:1])
    K = 4
    t0 = time.perf_counter()
    outs = [f(jnp.uint32(11 + i)) for i in range(K)]
    for o in outs:
        o[0].block_until_ready()
    _ = np.asarray(outs[-1][0][:1])
    dt = (time.perf_counter() - t0) / K
    rays = float(outs[-1][4])
    res[mb] = (dt, rays)
    print(f'mb={mb:2d}: {dt*1e3:7.1f} ms/band-sample  rays={rays/1e6:.2f}M '
          f'({rays/dt/1e6:.2f} Mrays/s)')

d3, r3 = res[3]
d32, r32 = res[32]
print(f'tail (bounces 3-32): +{(d32-d3)*1e3:.1f} ms for +{(r32-r3)/1e6:.2f}M '
      f'rays -> marginal {(r32-r3)/(d32-d3)/1e6:.2f} Mrays/s '
      f'({100*(d32-d3)/d32:.0f}% of the mb=32 sample)')
