"""Sort-key sweep v2: per-key WALL TIME + exact visit counts (pad-slot
iteration counter) on a realistic bounce wavefront. Same kernel for every
order — only the ray permutation changes, so one compile serves all keys.

Candidate keys include BVH-derived ones: the engine KNOWS which triangle the
previous bounce hit, so rays can be grouped by the leaf/subtree they start
on instead of a quantized morton box.

PYTHONPATH=/root/repo:/root/.axon_site python tools/sortkey_sweep2.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.core import camera as cam_mod
from cuda_pathtracer_tpu.ops import traverse_packet as tpk
from cuda_pathtracer_tpu.ops import intersect as isect
import cuda_pathtracer_tpu.models.pathtracer as ptm

scene = get_scene('sibenik', asset_dirs=['/root/reference', '.'])
arrays, dyn = scene.to_device(), scene.dynamic_arrays()
cam = cam_mod.Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
W, H = 1920, 192
B = W * H
ys, xs = np.mgrid[0:H, 0:W]
ro, rd = cam_mod.generate_rays_simple(
    cam, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()), W, 1080)
tables = tpk.split_packet_tables(np.asarray(dyn.wide_rows), scene.wide_depth)

# ---- realistic bounce wavefront: cosine-weighted around the hit normal ----
h = tpk.traverse_packet(arrays, tables, ro, rd)
hitn = np.asarray(h.t)
gid = np.asarray(h.prim_id)
ron, rdn = np.asarray(ro), np.asarray(rd)
hp = (ron + rdn * (np.minimum(hitn, 100.0)[:, None] - 1e-3)).astype(np.float32)

tris = np.asarray(dyn.world.tris)          # [WT, 9] world triangles
tgid = np.asarray(dyn.world.tri_gid)
# geometric normal per hit (gid indexes world triangle slots via prim_id)
pid = np.clip(gid, 0, len(tris) - 1)
e1 = tris[pid, 3:6] - tris[pid, 0:3]
e2 = tris[pid, 6:9] - tris[pid, 0:3]
nrm = np.cross(e1, e2)
nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
flip = (nrm * rdn).sum(1) > 0
nrm[flip] = -nrm[flip]

rng = np.random.default_rng(3)
r1, r2 = rng.random(B), rng.random(B)
# cosine hemisphere about nrm
st = np.sqrt(r1)
phi = 2 * np.pi * r2
tang = np.cross(nrm, np.where(np.abs(nrm[:, 0:1]) < 0.9,
                              [1.0, 0, 0], [0, 1.0, 0]))
tang /= np.maximum(np.linalg.norm(tang, axis=1, keepdims=True), 1e-12)
bit = np.cross(nrm, tang)
d2 = (st[:, None] * np.cos(phi)[:, None] * tang
      + st[:, None] * np.sin(phi)[:, None] * bit
      + np.sqrt(1 - r1)[:, None] * nrm).astype(np.float32)
d2 /= np.linalg.norm(d2, axis=1, keepdims=True)

alive = (hitn < 1e37) & (rng.random(B) < 0.35)   # ~bounce-1 live fraction

# ---- leaf row of the hit triangle: map gid -> leaf row index ----
wide = np.asarray(dyn.wide_rows)
tag = wide[:, 0]
leaf_ids = np.flatnonzero(tag < 0)
leaf_of_gid = np.full(int(tgid.max()) + 2, 0, np.int64)
from cuda_pathtracer_tpu.accel.wide import LEAF_GIDS, LEAF_GID_MAX
for li, rowid in enumerate(leaf_ids):
    g = wide[rowid, LEAF_GIDS:LEAF_GID_MAX].view(np.int32)
    g = g[g >= 0]
    leaf_of_gid[g] = li
hit_leaf = leaf_of_gid[np.clip(gid, 0, len(leaf_of_gid) - 1)]


def spread(v):
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton(p, bits):
    q = ((p - p.min(0)) / (np.ptp(p, 0) + 1e-6) * (2**bits - 1)).astype(np.int64)
    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


oct_ = ((d2[:, 0] > 0).astype(np.int64)
        | ((d2[:, 1] > 0).astype(np.int64) << 1)
        | ((d2[:, 2] > 0).astype(np.int64) << 2))

# fine cube-map direction (the engine's dir13)
ax = np.abs(d2)
face = np.where(ax[:, 0] >= np.maximum(ax[:, 1], ax[:, 2]), 0,
                np.where(ax[:, 1] >= ax[:, 2], 1, 2))
m = ax.max(1) + 1e-20
neg = d2[np.arange(B), face] < 0
u = d2[np.arange(B), (face + 1) % 3] / m
v = d2[np.arange(B), (face + 2) % 3] / m
qu = np.clip(((u + 1) * 15.5).astype(np.int64), 0, 31)
qv = np.clip(((v + 1) * 15.5).astype(np.int64), 0, 31)
dir13 = ((((face << 1) | neg.astype(np.int64)) << 10) | (qu << 5) | qv)

m30 = morton(hp, 10)
m15 = (m30 >> 12) & 0x7FFF
DEAD = np.int64(1) << 60

keys = {
    'engine (m15<<13|dir13)': (m15 << 13) | dir13,
    'morton30|oct': (m30 << 3) | oct_,
    'leaf|dir13': (hit_leaf.astype(np.int64) << 13) | dir13,
    'leaf|oct': (hit_leaf.astype(np.int64) << 3) | oct_,
    'm15|leaf-lo|dir13': (m15 << 23) | ((hit_leaf & 0x3FF) << 13) | dir13,
    'dir13|leaf': (dir13 << 20) | hit_leaf.astype(np.int64),
    'unsorted': np.arange(B, dtype=np.int64),
}


def ray_blocks(o_, d_, live_):
    o_ = jnp.asarray(o_)
    d_ = jnp.asarray(d_)
    inv = isect.safe_inv_dir(d_)
    t0 = jnp.full((B,), 3.0e38 / 2, jnp.float32)
    M = jnp.concatenate([
        o_, d_, inv, t0[:, None],
        jnp.asarray(live_, jnp.float32)[:, None],
        jnp.zeros((B, 1), jnp.float32),
        o_ * inv, jnp.zeros((B, 1), jnp.float32)], axis=1)
    rays = jnp.swapaxes(M.reshape(-1, tpk.PACKET, tpk.RAY_ROWS), -1, -2)
    return rays.reshape(-1, tpk.PACKET)


f = jax.jit(lambda r: tpk._run_packets(
    tables.inner, tables.leaf, r, depth=tables.depth, cheap=False,
    interpret=False))

print(f'live rays: {alive.sum()} / {B}')
for name, key in keys.items():
    key = np.where(alive, key, DEAD)           # dead lanes last
    order = np.argsort(key, kind='stable')
    rays = ray_blocks(hp[order], d2[order], alive[order])
    out = f(rays)
    _ = np.asarray(out[:1])
    K = 3
    t0_ = time.perf_counter()
    outs = [f(rays) for _ in range(K)]
    _ = np.asarray(outs[-1][:1])
    for o in outs:
        o.block_until_ready()
    dt = (time.perf_counter() - t0_) / K
    o4 = np.asarray(out).reshape(-1, 4, tpk.PACKET)
    sets = o4[0::tpk.NPK, 3, 0].astype(np.float64)
    nlive = alive.sum()
    print(f'{name:24s}: {dt*1e3:7.1f} ms  {nlive/dt/1e6:5.2f} Mrays/s(live)  '
          f'visits={sets.sum()*tpk.NPK/1e3:7.0f}k '
          f'({sets.sum()*tpk.NPK/max(nlive,1):5.2f}/live-ray)', flush=True)
