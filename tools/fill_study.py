"""A/B the wide-collapse slot-fill policy by simulated kernel visits.

The default collapse stops expanding a node once every slot subtree holds
<= LEAF_MAX tris, leaving bottom inner nodes with most of their 16 slots
EMPTY — yet the packet kernel's slab test prices all 16 lanes regardless.
CPT_WIDE_FILL=N keeps expanding the largest-area internal slot with > N
tris until the node's 16 slots are used (accel/wide.py). Effects priced
here (exact kernel-semantics union-visit counts, tools/slot_order_study.py
machinery):

  + fewer inner levels near the bottom -> fewer INNER visits, which in the
    v2 kernel carry the serialized cross-lane any-reduce
  + tighter per-leaf boxes -> packets cull leaf visits they'd have taken
  - more leaf rows (lower tri occupancy) -> possibly more LEAF visits and
    a bigger table (VMEM pressure; rows reported)

Usage: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/fill_study.py \
           [scene] [npackets] [policies...]
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
# env JAX_PLATFORMS=cpu alone can still block on the axon plugin's tunnel
# handshake when the tunnel is down; the in-process override never does
jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, os.path.dirname(__file__) + '/..')

from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.core import camera as cam_mod
from cuda_pathtracer_tpu.ops import traverse_packet2 as tpk2
from cuda_pathtracer_tpu.ops.traverse_packet import PACKET, PBOX0, PTRIS
from cuda_pathtracer_tpu.ops.traverse_packet2 import PMETA, META_BASE_BITS
from cuda_pathtracer_tpu.accel import wide as wide_mod
from cuda_pathtracer_tpu.accel.wide import ARITY, LEAF_MAX
from cuda_pathtracer_tpu.accel.bvh import build_bvh

sname = sys.argv[1] if len(sys.argv) > 1 else 'sibenik'
NP_ = int(sys.argv[2]) if len(sys.argv) > 2 else 60
POLICIES = sys.argv[3:] or ['default', '6', '3', '1']

scene = get_scene(sname, asset_dirs=['/root/reference', '.'])
arrays, dyn = scene.to_device(), scene.dynamic_arrays()
depth0 = scene.wide_depth
if sname == 'sibenik':
    cam = cam_mod.Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
else:
    cam = cam_mod.Camera.create([0, 6, -8], [0, -0.05, 1], 1.5, 8.0, 0.0)
W, H = 1920, 192
B = W * H
ys, xs = np.mgrid[0:H, 0:W]
ro, rd = cam_mod.generate_rays_simple(
    cam, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()), W, 1080)

from cuda_pathtracer_tpu.ops.traverse_wide import traverse_wide
hit = traverse_wide(arrays, dyn.wide_rows, depth0, ro, rd)
hitn = np.asarray(hit.t)
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
TH, TW = 8, 16
perm = (np.arange(B).reshape(H // TH, TH, W // TW, TW)
        .transpose(0, 2, 1, 3).reshape(-1))
BIG = np.float32(1e30)


def simulate(rows):
    boxes = rows[:, PBOX0:PBOX0 + 96].reshape(-1, 6, ARITY)
    metas = rows[:, PMETA].view(np.int32)
    tris = rows[:, PTRIS:PTRIS + 9 * LEAF_MAX].reshape(-1, 9, LEAF_MAX)

    def sim_packet(o, d, live):
        inv = np.where(np.abs(d) < 1e-20, 1e20, 1.0 / d).astype(np.float32)
        oiv = (o * inv).astype(np.float32)
        t = np.full(PACKET, 1e30, np.float32)
        t[~live] = -BIG
        stack = []
        cur = 0 if live.any() else None
        inner_v = leaf_v = 0
        while cur is not None:
            if cur >= 0:
                inner_v += 1
                bx = boxes[cur]
                t0 = bx[0:3, :, None] * inv.T[:, None, :] - oiv.T[:, None, :]
                t1 = bx[3:6, :, None] * inv.T[:, None, :] - oiv.T[:, None, :]
                tmin = np.maximum(np.minimum(t0, t1).max(0), 0.0)
                tmax = np.maximum(t0, t1).min(0)
                chit = (tmax >= tmin) & (
                    np.minimum(t0, t1).max(0) < t[None, :])
                bits = int(((chit.any(1)) * (1 << np.arange(ARITY))).sum())
                meta = int(metas[cur])
            else:
                leaf_v += 1
                row = tris[~cur]
                v0 = row[0:3].T[:, None, :]
                e1 = row[3:6].T[:, None, :]
                e2 = row[6:9].T[:, None, :]
                h = np.cross(d[None], e2)
                a = (e1 * h).sum(-1)
                f = np.where(np.abs(a) < 1e-4, 1.0, 1.0 / np.where(
                    np.abs(a) < 1e-4, 1.0, a))
                s = o[None] - v0
                u = f * (s * h).sum(-1)
                qv = np.cross(s, e1)
                vv = f * (d[None] * qv).sum(-1)
                tt = f * (e2 * qv).sum(-1)
                ok = ((np.abs(a) >= 1e-4) & (u >= 0) & (u <= 1) & (vv >= 0)
                      & (u + vv <= 1) & (tt > 0) & (tt < t[None, :]))
                tm = np.where(ok, tt, 1e30).min(0)
                t = np.where(ok.any(0), np.minimum(t, tm), t)
                bits = 0
                meta = 0
            if bits:
                low = bits & (-bits)
                j = low.bit_length() - 1
                base = meta & ((1 << META_BASE_BITS) - 1)
                n_inner = meta >> META_BASE_BITS
                child = base + j
                nxt = child if j < n_inner else ~child
                rest = bits ^ low
                if rest:
                    stack.append([rest, meta])
                cur = nxt
            else:
                while stack:
                    bits2, meta2 = stack[-1]
                    low = bits2 & (-bits2)
                    stack[-1][0] = bits2 ^ low
                    if stack[-1][0] == 0:
                        stack.pop()
                    j = low.bit_length() - 1
                    base = meta2 & ((1 << META_BASE_BITS) - 1)
                    n_inner = meta2 >> META_BASE_BITS
                    child = base + j
                    cur = child if j < n_inner else ~child
                    break
                else:
                    cur = None
        return inner_v, leaf_v

    out = {}
    for name, (o_, d_, order) in {
            'prim': (ron, rdn, perm), 'bounce': (hp, d2, om)}.items():
        o_s, d_s = o_[order], d_[order]
        sel = np.random.default_rng(7).choice(
            B // PACKET, size=min(NP_, B // PACKET), replace=False)
        iv_ = lv_ = 0
        for pidx in sel:
            sl = slice(pidx * PACKET, (pidx + 1) * PACKET)
            a, b = sim_packet(o_s[sl], d_s[sl], np.ones(PACKET, bool))
            iv_ += a
            lv_ += b
        out[name] = (iv_ / len(sel), lv_ / len(sel))
    return out


# rebuild the world wide table per policy from the scene's models: reuse the
# per-model binary BVHs via Scene internals (the scene keeps model triangle
# blocks), falling back to a single re-collapse of the whole world when the
# scene is one mesh. Simplest faithful route: re-run the scene's wide build
# with the policy env var set.
for policy in POLICIES:
    os.environ['CPT_WIDE_FILL'] = policy
    sc = get_scene(sname, asset_dirs=['/root/reference', '.'])
    dyn_p = sc.dynamic_arrays()
    wide_p = np.asarray(dyn_p.wide_rows)
    merged = tpk2.build_merged_table(wide_p, sc.wide_depth)
    rows = np.asarray(merged.rows)
    r = simulate(rows)
    mb = rows.nbytes / 1e6
    print(f'fill={policy:8s} rows={len(rows):7d} ({mb:6.1f} MB) '
          f'depth={sc.wide_depth}')
    for name, (iv, lv) in r.items():
        print(f'    {name:7s}: inner {iv:7.1f}  leaf {lv:6.1f}  '
              f'total {iv+lv:7.1f} visits/packet ({(iv+lv)/PACKET:5.2f}/ray)')
os.environ.pop('CPT_WIDE_FILL', None)
