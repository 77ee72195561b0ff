"""Multi-push kernel (ops/traverse_packet2.py) vs the shipped v1 packet
kernel on REAL sibenik wavefronts: correctness diff + isolated throughput.

Wavefronts: tile-ordered primaries, morton+dir-sorted bounce hemisphere,
dest-sorted NEE-style any-hit.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/multipush_lab.py
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
from cuda_pathtracer_tpu.ops import traverse_packet as tpk
from cuda_pathtracer_tpu.ops import traverse_packet2 as tpk2

INTERP = jax.default_backend() == 'cpu'

scene = get_scene('sibenik', asset_dirs=['/root/reference', '.'])
arrays = scene.to_device()
dyn = scene.dynamic_arrays()
cam = cam_mod.Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
W, H = 1920, 192
if INTERP:
    W, H = 128, 16
B = W * H
ys, xs = np.mgrid[0:H, 0:W]
ro, rd = cam_mod.generate_rays_simple(
    cam, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()), W, 1080)
tables1 = tpk.split_packet_tables(np.asarray(dyn.wide_rows), scene.wide_depth)
merged = tpk2.build_merged_table(np.asarray(dyn.wide_rows), scene.wide_depth)
print(f'tables: v1 inner {tables1.inner.shape[0]} + leaf '
      f'{tables1.leaf.shape[0]}; merged {merged.rows.shape[0]} rows')

TH, TW = 8, 16
perm = np.arange(B).reshape(H // TH, TH, W // TW, TW) \
    .transpose(0, 2, 1, 3).reshape(-1)

h1 = tpk.traverse_packet(arrays, tables1, ro, rd, interpret=INTERP)
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


def run(kind, name, o, d, order, anyhit):
    if kind == 'v1':
        f = jax.jit(lambda o, d, order: tpk.traverse_packet(
            arrays, tables1, o, d, order=order, any_hit=anyhit,
            interpret=INTERP))
    elif kind == 'v2b':
        f = jax.jit(lambda o, d, order: tpk2.traverse_packet2(
            arrays, merged, o, d, order=order, any_hit=anyhit,
            interpret=INTERP, batched=True))
    elif kind == 'v2s':
        f = jax.jit(lambda o, d, order: tpk2.traverse_packet2(
            arrays, merged, o, d, order=order, any_hit=anyhit,
            interpret=INTERP, share=8))
    elif kind == 'v2s16':
        f = jax.jit(lambda o, d, order: tpk2.traverse_packet2(
            arrays, merged, o, d, order=order, any_hit=anyhit,
            interpret=INTERP, share=16))
    else:
        f = jax.jit(lambda o, d, order: tpk2.traverse_packet2(
            arrays, merged, o, d, order=order, any_hit=anyhit,
            interpret=INTERP))
    out = f(o, d, order)
    out.t.block_until_ready()
    _ = np.asarray(out.t[:1])
    if INTERP:
        return out, 1.0
    K = 3
    t0 = time.perf_counter()
    outs = [f(o, d, order) for _ in range(K)]
    for ot in outs:
        ot.t.block_until_ready()
    _ = np.asarray(outs[-1].t[:1])
    dt = (time.perf_counter() - t0) / K
    return out, dt


KINDS = sys.argv[1:] or ['v1', 'v2']

for name, (o, d, order, anyhit) in WAVES.items():
    outs = {}
    for kind in KINDS:
        outs[kind], dt = run(kind, name, o, d, order, anyhit)
        outs[kind + '_dt'] = dt
    base = KINDS[0]
    line = f'{name:7s}:'
    for kind in KINDS:
        dt = outs[kind + '_dt']
        line += f'  {kind} {dt*1e3:7.2f} ms ({B/dt/1e6:6.2f} Mrays/s)'
    o1, o2 = outs[base], outs[KINDS[-1]]
    t1, t2 = np.asarray(o1.t), np.asarray(o2.t)
    tmis = (~np.isclose(t1, t2, rtol=1e-6, atol=1e-6)).sum()
    imis = (np.asarray(o1.intersected) != np.asarray(o2.intersected)).sum()
    pmis = (np.asarray(o1.prim_id) != np.asarray(o2.prim_id)).sum()
    line += (f'  speedup {outs[base + "_dt"]/outs[KINDS[-1] + "_dt"]:5.2f}x'
             f'  mismatches t={tmis} hit={imis} pid={pmis} / {B}')
    print(line)
