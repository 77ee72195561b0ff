"""Visit inflation of conservatively-rounded bf16 box planes (exact sim).

kernel_lab3's `bf16` variant prices the in-kernel UNPACK + f32 slab cost of
storing the merged table's 96 box planes as bf16 pairs (halves the box fetch
volume; 2x VMEM capacity for inner rows). What it cannot price is the visit
inflation: bf16 boxes must be rounded CONSERVATIVELY (lo toward -inf, hi
toward +inf) so culls stay sound, which inflates every box by up to 1 part
in 2^8 per plane and makes slightly more children pass the slab test.

This script counts exact kernel-semantics union visits (same simulation as
tools/slot_order_study.py) with f32 vs conservative-bf16 boxes, on
tile-ordered primary and morton+dir-sorted bounce wavefronts. Leaf payloads
stay f32 in both arms (the bf16 design never touches triangle data).

Usage: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/bf16_box_study.py
       [scene] [npackets]
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


def bf16_conservative(boxes):
    """[N,6,16] f32 -> bf16-representable f32, lo rounded down, hi up.

    bf16 = f32 with the low 16 mantissa bits dropped. Truncation rounds
    toward zero; when that moved the value the wrong way, step one bf16 ulp
    away from zero (in the uint32 grid, +0x10000 always increases magnitude).
    NaN slots (empty children) pass through untouched.
    """
    b = np.ascontiguousarray(boxes, np.float32)
    u = b.view(np.uint32)
    trunc = (u & np.uint32(0xFFFF0000)).view(np.float32)
    stepped = ((u & np.uint32(0xFFFF0000)) + np.uint32(0x00010000)
               ).view(np.float32)
    down = np.where(trunc <= b, trunc, stepped)   # trunc > b only when b < 0
    up = np.where(trunc >= b, trunc, stepped)     # trunc < b only when b > 0
    r = b.copy()
    fin = np.isfinite(b)
    r[:, 0:3] = np.where(fin[:, 0:3], down[:, 0:3], b[:, 0:3])
    r[:, 3:6] = np.where(fin[:, 3:6], up[:, 3:6], b[:, 3:6])
    # soundness: the rounded box must CONTAIN the original
    assert (r[:, 0:3][fin[:, 0:3]] <= b[:, 0:3][fin[:, 0:3]]).all()
    assert (r[:, 3:6][fin[:, 3:6]] >= b[:, 3:6][fin[:, 3:6]]).all()
    return r


def main():
    sname = sys.argv[1] if len(sys.argv) > 1 else 'sibenik'
    NP_ = int(sys.argv[2]) if len(sys.argv) > 2 else 60

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
    boxes_f32 = rows[:, PBOX0:PBOX0 + 96].reshape(-1, 6, ARITY)
    metas = rows[:, PMETA].view(np.int32)
    tris = rows[:, PTRIS:PTRIS + 9 * LEAF_MAX].reshape(-1, 9, LEAF_MAX)

    def simulate(boxes):
        def sim_packet(o, d, live):
            inv = np.where(np.abs(d) < 1e-20, 1e20, 1.0 / d
                           ).astype(np.float32)
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
                    t0 = (bx[0:3, :, None] * inv.T[:, None, :]
                          - oiv.T[:, None, :])
                    t1 = (bx[3:6, :, None] * inv.T[:, None, :]
                          - oiv.T[:, None, :])
                    tmin = np.maximum(np.minimum(t0, t1).max(0), 0.0)
                    tmax = np.maximum(t0, t1).min(0)
                    chit = (tmax >= tmin) & (
                        np.minimum(t0, t1).max(0) < t[None, :])
                    bits = int(((chit.any(1))
                                * (1 << np.arange(ARITY))).sum())
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
                    ok = ((np.abs(a) >= 1e-4) & (u >= 0) & (u <= 1)
                          & (vv >= 0) & (u + vv <= 1) & (tt > 0)
                          & (tt < t[None, :]))
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

    base = simulate(boxes_f32)
    conv = simulate(bf16_conservative(boxes_f32))
    for name in ('prim', 'bounce'):
        iv0, lv0 = base[name]
        iv1, lv1 = conv[name]
        print(f'{name:7s}: f32 {iv0 + lv0:7.1f} visits/packet '
              f'(inner {iv0:.1f} leaf {lv0:.1f})  ->  '
              f'bf16 {iv1 + lv1:7.1f} (inner {iv1:.1f} leaf {lv1:.1f})  '
              f'inflation {100 * ((iv1 + lv1) / (iv0 + lv0) - 1):+.2f}%')


if __name__ == '__main__':
    main()
