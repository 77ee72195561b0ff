"""Dump the optimized HLO of the INTERACTIVE frame program (the same
frames_device jit as tools/interactive_profile.py) and print requested
fusion definitions.

Usage: PYTHONPATH=/root/repo python tools/interactive_hlo.py [fusion.402 ...]
Writes full text to /tmp/interactive_hlo.txt.
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(__file__) + '/..')

from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.core.camera import Camera
from cuda_pathtracer_tpu.models.pathtracer import render_sample, tile_unpermute
from cuda_pathtracer_tpu.models import film
from cuda_pathtracer_tpu.models.guiding import init_radiance_state

K = int(os.environ.get('K', '4'))
scene = get_scene('sibenik', asset_dirs=['/root/reference', '.'])
arrays, dyn = scene.to_device(), scene.dynamic_arrays()
cam = Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
iw, ih = 640, 480
radiance = init_radiance_state(int(arrays.tri_mat.shape[0]))
wd = -(-scene.wide_depth // 4) * 4
bn_np = np.asarray(arrays.blue_noise)
_lanes = np.arange(iw * ih)
_tpr = iw // 16
_g, _wl = _lanes // 128, _lanes % 128
bn_lanes = jnp.asarray(bn_np[((_g // _tpr) * 8 + _wl // 16) % bn_np.shape[0],
                             ((_g % _tpr) * 16 + _wl % 16) % bn_np.shape[1]])


@jax.jit
def frames_device(rand0):
    def one(i, carry):
        rand_idx, _ = carry
        l0, a0 = film.clear_accumulators(iw * ih)
        l1, a1, _, ridx, _ = render_sample(
            arrays, dyn, cam, radiance, l0, a0,
            jnp.uint32(0), rand_idx, jnp.asarray(False), bn_lanes,
            nee=True, cache_on=False, max_bounces=2,
            width=iw, height=ih, wide_depth=wd, tile_order=True,
            guide_off=True)
        l1 = tile_unpermute(l1, iw, ih)
        a1 = tile_unpermute(a1, iw, ih)
        img = film.display(l1, a1, 1.0, iw, ih, blur=False)
        return ridx, img
    return jax.lax.fori_loop(0, K, one, (rand0, jnp.zeros(
        (ih, iw, 3), jnp.float32)))


txt = jax.jit(frames_device).lower(jnp.uint32(3)).compile().as_text()
open('/tmp/interactive_hlo.txt', 'w').write(txt)
print(f'wrote /tmp/interactive_hlo.txt ({len(txt)} bytes)')

import re
for name in sys.argv[1:]:
    print('=' * 70)
    # the fusion instruction line (call site) and its computation
    for m in re.finditer(rf'\b{re.escape(name)} = [^\n]+', txt):
        print(m.group(0)[:2000])
    # find the fused computation body
    cm = re.search(rf'%fused_computation[^\n]*\n', txt)
    # print the computation named by the fusion's calls= attribute
    call = re.search(rf'{re.escape(name)} = [^\n]*calls=([%\w.\-]+)', txt)
    if call:
        comp = call.group(1).lstrip('%')
        body = re.search(
            rf'^\s*%?{re.escape(comp)}[^\n]*\{{(.*?)^\s*\}}',
            txt, re.S | re.M)
        if body:
            print(body.group(0)[:4000])
