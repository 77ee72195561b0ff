"""Isolate the HBM-DMA cost of the v2 packet kernel: the SAME sibenik
wavefronts traversed with the merged table VMEM-resident vs forced
hbm=True (per-visit DMA). The ratio is the pure DMA multiplier at equal
visit counts — separating "2mtris is DMA-bound" from "2mtris wavefronts
take more visits" (tools/tpu_op_profile.py: the 2mtris kernel is 85% of a
band-sample at ~8.5x sibenik's per-ray cost).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/hbm_lab.py
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
from cuda_pathtracer_tpu.core import camera as cam_mod
from cuda_pathtracer_tpu.ops import traverse_packet2 as tpk2

scene = get_scene('sibenik', asset_dirs=['/root/reference', '.'])
arrays = scene.to_device()
dyn = scene.dynamic_arrays()
cam = cam_mod.Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
W, H = 1920, 192
B = W * H
ys, xs = np.mgrid[0:H, 0:W]
ro, rd = cam_mod.generate_rays_simple(
    cam, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()), W, 1080)
merged = tpk2.build_merged_table(np.asarray(dyn.wide_rows), scene.wide_depth)
print(f'merged rows: {merged.rows.shape[0]}')

TH, TW = 8, 16
perm = np.arange(B).reshape(H // TH, TH, W // TW, TW) \
    .transpose(0, 2, 1, 3).reshape(-1)

h1 = tpk2.traverse_packet2(arrays, merged, ro, rd,
                           order=jnp.asarray(perm))
hitn = np.asarray(h1.t)
ron, rdn = np.asarray(ro), np.asarray(rd)
hp = (ron + rdn * (np.minimum(hitn, 100.0)[:, None] - 1e-3)).astype(np.float32)
rng = np.random.default_rng(1)
d2 = rng.normal(size=(B, 3)).astype(np.float32)
d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
flip = (d2 * rdn).sum(1) > 0
d2[flip] = -d2[flip]
q = ((hp - hp.min(0)) / (np.ptp(hp, 0) + 1e-6) * 1023).astype(np.int64)


def spread(v):
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


morton = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
oct_ = ((d2[:, 0] > 0).astype(np.int64)
        | ((d2[:, 1] > 0).astype(np.int64) << 1)
        | ((d2[:, 2] > 0).astype(np.int64) << 2))
om = np.argsort((morton << 3) | oct_, kind='stable')

WAVES = {
    'prim': (ro, rd, jnp.asarray(perm), False),
    'bounce': (jnp.asarray(hp), jnp.asarray(d2), jnp.asarray(om), False),
    'anyhit': (jnp.asarray(hp), jnp.asarray(d2), jnp.asarray(om), True),
}


def run(hbm, o, d, order, anyhit):
    f = jax.jit(lambda o, d, order: tpk2.traverse_packet2(
        arrays, merged, o, d, order=order, any_hit=anyhit, hbm=hbm))
    out = f(o, d, order)
    out.t.block_until_ready()
    _ = np.asarray(out.t[:1])
    K = 3
    t0 = time.perf_counter()
    outs = [f(o, d, order) for _ in range(K)]
    for ot in outs:
        ot.t.block_until_ready()
    _ = np.asarray(outs[-1].t[:1])
    return out, (time.perf_counter() - t0) / K


for name, (o, d, order, anyhit) in WAVES.items():
    ov, dv = run(False, o, d, order, anyhit)
    oh, dh = run(True, o, d, order, anyhit)
    same = np.isclose(np.asarray(ov.t), np.asarray(oh.t),
                      rtol=1e-6, atol=1e-6).mean()
    print(f'{name:7s}: vmem {dv*1e3:7.2f} ms ({B/dv/1e6:6.2f} Mrays/s)  '
          f'hbm {dh*1e3:7.2f} ms ({B/dh/1e6:6.2f} Mrays/s)  '
          f'dma-mult {dh/dv:5.2f}x  t-agree {100*same:.2f}%')
