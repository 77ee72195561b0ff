"""Dump the optimized HLO of one converge band-sample (same program as
tools/tpu_op_profile.py) and print the definition of named fusions so the
trace's `fusion.NNNN` rows can be attributed to source ops.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/hlo_dump.py \
           [fusion.1259 fusion.1279 ...]   (no args: write full text only)

Writes the full module text to /tmp/render_sample_hlo.txt either way.
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
from cuda_pathtracer_tpu.models.pathtracer import render_sample
from cuda_pathtracer_tpu.models import film
from cuda_pathtracer_tpu.models.guiding import init_radiance_state

MB = int(os.environ.get('PROF_MB', '32'))
scene = get_scene(os.environ.get('PROF_SCENE', 'sibenik'),
                  asset_dirs=['/root/reference', '.'])
arrays, dyn = scene.to_device(), scene.dynamic_arrays()
cam = Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
W = int(os.environ.get('PROF_W', '1920'))
H = int(os.environ.get('PROF_H', '216'))
B = W * H
radiance = init_radiance_state(int(arrays.tri_mat.shape[0]))
lum, alb = film.clear_accumulators(B)
wd = -(-scene.wide_depth // 4) * 4


def frame():
    return render_sample(arrays, dyn, cam, radiance, lum, alb,
                         jnp.uint32(1), jnp.uint32(7), jnp.asarray(True),
                         nee=True, cache_on=True, max_bounces=MB,
                         width=W, height=H, full_height=1080,
                         wide_depth=wd, tile_order=True)


lowered = jax.jit(frame).lower()
compiled = lowered.compile()
txt = compiled.as_text()
open('/tmp/render_sample_hlo.txt', 'w').write(txt)
print(f'wrote {len(txt)} bytes to /tmp/render_sample_hlo.txt')

for want in sys.argv[1:]:
    # fusion definitions look like:  %fusion.1259 = ... fusion(...), kind=...
    for line in txt.splitlines():
        ls = line.strip()
        if ls.startswith(f'%{want} ') or ls.startswith(f'{want} '):
            print('\n==', want, '==')
            print(ls[:600])
            # print the called computation name if present
            if 'calls=' in ls:
                comp = ls.split('calls=')[1].split(',')[0].split(' ')[0]
                print('  calls:', comp)
