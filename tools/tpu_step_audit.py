"""Exact step-count + ns/iteration audit of the production packet kernel.

Uses the pad output slot (while-iteration count per grid cell) to separate
step COUNT from step COST on real sibenik wavefronts. Sweep fronts with
CPT_PKF.
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
from cuda_pathtracer_tpu.ops import intersect as isect

scene = get_scene('sibenik', asset_dirs=['/root/reference', '.'])
dyn = scene.dynamic_arrays()
cam = cam_mod.Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
W, H = 1920, 192
ys, xs = np.mgrid[0:H, 0:W]
B = W * H
ro, rd = cam_mod.generate_rays_simple(
    cam, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()), W, 1080)
tables = tpk.split_packet_tables(np.asarray(dyn.wide_rows), scene.wide_depth)
TH, TW = 8, 16
perm = jnp.asarray(np.arange(B).reshape(H // TH, TH, W // TW, TW)
                   .transpose(0, 2, 1, 3).reshape(-1))


def ray_blocks(ro_, rd_):
    inv = isect.safe_inv_dir(rd_)
    t0 = jnp.full((B,), 3.0e38 / 2, jnp.float32)
    M = jnp.concatenate([
        ro_, rd_, inv, t0[:, None],
        jnp.ones((B, 1), jnp.float32),
        jnp.zeros((B, 1), jnp.float32),
        ro_ * inv, jnp.zeros((B, 1), jnp.float32)], axis=1)
    rays = jnp.swapaxes(M.reshape(-1, tpk.PACKET, tpk.RAY_ROWS), -1, -2)
    return rays.reshape(-1, tpk.PACKET)


def audit(name, rays, K=3):
    f = jax.jit(lambda r: tpk._run_packets(
        tables.inner, tables.leaf, r, depth=tables.depth,
        cheap=tpk.CHEAP_ALL, interpret=False))
    out = f(rays)
    _ = np.asarray(out[:1])
    t0 = time.perf_counter()
    outs = [f(rays) for _ in range(K)]
    _ = np.asarray(outs[-1][:1])
    for o in outs:
        o.block_until_ready()
    dt = (time.perf_counter() - t0) / K
    o4 = np.asarray(out).reshape(-1, 4, tpk.PACKET)
    steps_cell = o4[0::tpk.NPK * tpk.PPC, 3, 0].astype(np.float64)
    # pad = per-SET iteration count on every packet of the set.
    # NOTE: the ms/Mrays wall numbers here INCLUDE the ~30 ms per-call
    # tunnel RTT (even K pipelined calls serialize on this tunnel) — on
    # short workloads (coherent primaries) the RTT dominates: subtract it
    # before deriving per-iteration costs.
    sets = o4[0::tpk.NPK, 3, 0].astype(np.float64)
    total_iters = sets.sum()
    visits = total_iters * tpk.NPK * tpk.NF  # upper bound (idle fronts too)
    print(f'{name}: {dt*1e3:8.2f} ms  {B/dt/1e6:6.2f} Mrays/s  '
          f'iters/set mean={sets.mean():7.1f} max={sets.max():6.0f} '
          f'-> {dt/total_iters*1e9:7.1f} ns/iter '
          f'({total_iters*tpk.NPK/B:5.2f} packet-steps/ray-slot)', flush=True)


prim = ray_blocks(ro[perm], rd[perm])
h = tpk.traverse_packet(scene.to_device(), tables, ro, rd)
hitn = np.asarray(h.t)
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
bounce = ray_blocks(jnp.asarray(hp[om]), jnp.asarray(d2[om]))

print(f'NPK={tpk.NPK} NF={tpk.NF}')
audit('primary', prim)
audit('bounce ', bounce)
