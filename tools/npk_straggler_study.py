"""Straggler factor of interleaving NPK packets per kernel set (exact sim).

A v2 kernel set runs NPK packets in one while_loop: every iteration advances
all NPK packets one visit (retired packets do don't-care work), so the set's
iteration count is max over the packets' individual chain lengths. The
batched shared-reduce variant (CPT_V2B) wants NPK=4 or 8 to amortize the one
cross-lane reduce, but pays E[max_k]/E[mean_k] in stragglers — this script
measures that factor for consecutive packets of the engine-sorted wavefronts
(the grouping the engine actually dispatches).

Counts exact kernel-semantics visits per packet (same simulation as
tools/slot_order_study.py), then reports E[max of k consecutive]/E[mean]
for k = 1, 2, 4, 8.

Usage: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python
       tools/npk_straggler_study.py [scene] [npackets]
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(__file__) + '/..')

from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.core import camera as cam_mod
from cuda_pathtracer_tpu.ops import traverse_packet2 as tpk2
from cuda_pathtracer_tpu.ops.traverse_packet import PACKET, PBOX0, PTRIS
from cuda_pathtracer_tpu.ops.traverse_packet2 import PMETA, META_BASE_BITS
from cuda_pathtracer_tpu.accel.wide import ARITY, LEAF_MAX


def main():
    sname = sys.argv[1] if len(sys.argv) > 1 else 'sibenik'
    NRUN = int(sys.argv[2]) if len(sys.argv) > 2 else 64  # 8-packet runs

    scene = get_scene(sname, asset_dirs=['/root/reference', '.'])
    arrays, dyn = scene.to_device(), scene.dynamic_arrays()
    wide = np.asarray(dyn.wide_rows)
    depth = scene.wide_depth
    if sname == 'sibenik':
        cam = cam_mod.Camera.create([0.0, 5.0, -16.0], [0, 0, 1],
                                    1.5, 12.0, 0.0)
    else:
        cam = cam_mod.Camera.create([0, 6, -8], [0, -0.05, 1], 1.5, 8.0, 0.0)
    W, H = 1920, 192
    B = W * H
    ys, xs = np.mgrid[0:H, 0:W]
    ro, rd = cam_mod.generate_rays_simple(
        cam, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()), W, 1080)

    from cuda_pathtracer_tpu.ops.traverse_wide import traverse_wide
    hit = traverse_wide(arrays, dyn.wide_rows, depth, ro, rd)
    hitn = np.asarray(hit.t)
    ron, rdn = np.asarray(ro), np.asarray(rd)
    hp = (ron + rdn * (np.minimum(hitn, 100.0)[:, None] - 1e-3)
          ).astype(np.float32)
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

    rows = np.asarray(tpk2.build_merged_table(wide, depth).rows)
    boxes = rows[:, PBOX0:PBOX0 + 96].reshape(-1, 6, ARITY)
    metas = rows[:, PMETA].view(np.int32)
    tris = rows[:, PTRIS:PTRIS + 9 * LEAF_MAX].reshape(-1, 9, LEAF_MAX)

    def sim_packet(o, d):
        inv = np.where(np.abs(d) < 1e-20, 1e20, 1.0 / d).astype(np.float32)
        oiv = (o * inv).astype(np.float32)
        t = np.full(PACKET, 1e30, np.float32)
        stack = []
        cur = 0
        visits = 0
        while cur is not None:
            visits += 1
            if cur >= 0:
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
        return visits

    for name, (o_, d_, order) in {'prim': (ron, rdn, perm),
                                  'bounce': (hp, d2, om)}.items():
        o_s, d_s = o_[order], d_[order]
        npk_total = B // PACKET
        # runs of 8 CONSECUTIVE packets (what a set would co-schedule)
        starts = np.random.default_rng(7).choice(
            npk_total // 8, size=min(NRUN, npk_total // 8), replace=False) * 8
        steps = np.zeros((len(starts), 8), np.int64)
        for i, s0 in enumerate(starts):
            for k in range(8):
                sl = slice((s0 + k) * PACKET, (s0 + k + 1) * PACKET)
                steps[i, k] = sim_packet(o_s[sl], d_s[sl])
        mean = steps.mean()
        line = [f'{name:7s}: mean {mean:7.1f} steps/packet;']
        for k in (2, 4, 8):
            g = steps.reshape(len(starts), 8 // k, k)
            factor = g.max(axis=2).mean() / mean
            line.append(f'k={k}: {factor:.3f}')
        print('  '.join(line))


if __name__ == '__main__':
    main()
