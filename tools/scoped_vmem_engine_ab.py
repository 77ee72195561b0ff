"""A/B the REAL render_sample executable under different
xla_tpu_scoped_vmem_limit_kib values (per-jit compiler_options — the only
channel that reaches the tunneled TPU compiler; XLA_FLAGS is parsed locally
and rejects libtpu flags).

Motivation: at HEAD the shade-stage tri_meta gather ([164620,16] table) runs
from HBM in the slow {1,0} emitter at ~6.5 ms/bounce while the SAME-shape
trip table gather runs from XLA-staged scoped VMEM (S(1)) at ~0.75 ms
(tools/tpu_op_profile.py fusion.1258 vs fusion.1260). A bigger scoped budget
should let XLA stage tri_meta too.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/scoped_vmem_engine_ab.py [kib ...]
"""
import os
import re
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

kwargs = dict(nee=True, cache_on=True, max_bounces=32, width=W, height=H,
              full_height=1080, wide_depth=wd, tile_order=True)
args = (arrays, dyn, cam, radiance, lum, alb,
        jnp.uint32(1), jnp.uint32(7), jnp.asarray(True))

REPS = 3
for kib in (sys.argv[1:] or ['default', '32768', '49152', '65536']):
    lowered = render_sample.lower(*args, **kwargs)
    try:
        if kib == 'default':
            comp = lowered.compile()
        else:
            comp = lowered.compile(
                compiler_options={'xla_tpu_scoped_vmem_limit_kib': kib})
    except Exception as e:  # noqa: BLE001
        print(f'kib={kib}: COMPILE FAILED: {str(e)[:200]}')
        continue
    txt = comp.as_text()
    s1_meta = len(re.findall(
        r'f32\[164620,16\]\{[01],[01]:T\(8,128\)S\(1\)\}', txt))
    out = comp(*args)
    out[0].block_until_ready()
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = comp(*args)
        out[0].block_until_ready()
        _ = np.asarray(out[0][:1])
        best = min(best, time.perf_counter() - t0)
    print(f'kib={kib}: {best*1e3:7.1f} ms/band-sample, '
          f'tri_meta-shaped S(1) appearances={s1_meta}')
