"""A/B the wide-BVH collapse policies (greedy largest-area vs the Ylitie-
style DP, accel/wide.py) by exact kernel-semantics union simulation on real
sibenik wavefronts: primary tile packets, sorted bounce hemispheres, and
sorted NEE any-hit feelers.

Reports union visits/ray and a projected ns/ray from the measured step
prices (inner ~430 ns, leaf ~610 ns — PERF.md kernel_lab3).

Usage: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/collapse_ab.py [npackets]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__) + '/..')

NP_ = int(sys.argv[1]) if len(sys.argv) > 1 else 96
C_INNER, C_LEAF = 430.0, 610.0


def build(policy):
    os.environ['CPT_COLLAPSE'] = policy
    # scene caches would hide the env change: fresh interpreter state per
    # policy via a subprocess would be cleaner, but the builder reads the
    # env at build time and get_scene builds fresh per call
    import importlib
    from cuda_pathtracer_tpu.scene import builder as b
    importlib.reload(b)
    scene = b.get_scene('sibenik', asset_dirs=['/root/reference', '.'])
    dyn = scene.dynamic_arrays()
    from cuda_pathtracer_tpu.ops import traverse_packet2 as tpk2
    merged = tpk2.build_merged_table(np.asarray(dyn.wide_rows),
                                     scene.wide_depth)
    return np.asarray(merged.rows)


def make_walker(rows):
    from cuda_pathtracer_tpu.ops.traverse_packet import PBOX0, PTRIS
    from cuda_pathtracer_tpu.ops.traverse_packet2 import (PMETA,
                                                          META_BASE_BITS)
    from cuda_pathtracer_tpu.accel.wide import ARITY, LEAF_MAX
    boxes = rows[:, PBOX0:PBOX0 + 96].reshape(-1, 6, ARITY)
    metas = rows[:, PMETA].view(np.int32)
    tris = rows[:, PTRIS:PTRIS + 9 * LEAF_MAX].reshape(-1, 9, LEAF_MAX)

    def slab_chit(cur, inv, oiv, t):
        bx = boxes[cur]
        t0 = bx[0:3, :, None] * inv.T[:, None, :] - oiv.T[:, None, :]
        t1 = bx[3:6, :, None] * inv.T[:, None, :] - oiv.T[:, None, :]
        tmin = np.maximum(np.minimum(t0, t1).max(0), 0.0)
        tmax = np.maximum(t0, t1).min(0)
        chit = (tmax >= tmin) & (tmin < t[None, :])
        return int(((chit.any(1)) * (1 << np.arange(ARITY))).sum())

    def leaf_tmin(cur, o, d, t):
        row = tris[cur]
        v0 = row[0:3].T[:, None, :]
        e1 = row[3:6].T[:, None, :]
        e2 = row[6:9].T[:, None, :]
        h = np.cross(d[None], e2)
        a = (e1 * h).sum(-1)
        f = np.where(np.abs(a) < 1e-4, 1.0,
                     1.0 / np.where(np.abs(a) < 1e-4, 1.0, a))
        s = o[None] - v0
        u = f * (s * h).sum(-1)
        qv = np.cross(s, e1)
        vv = f * (d[None] * qv).sum(-1)
        tt = f * (e2 * qv).sum(-1)
        ok = ((np.abs(a) >= 1e-4) & (u >= 0) & (u <= 1) & (vv >= 0)
              & (u + vv <= 1) & (tt > 0) & (tt < t[None, :]))
        return np.where(ok, tt, 1e30).min(0), ok.any(0)

    def unspool(bits, meta):
        out = []
        base = meta & ((1 << META_BASE_BITS) - 1)
        n_inner = meta >> META_BASE_BITS
        while bits:
            low = bits & (-bits)
            j = low.bit_length() - 1
            child = base + j
            out.append(child if j < n_inner else ~child)
            bits ^= low
        return out

    def sim_union(o, d):
        inv = np.where(np.abs(d) < 1e-20, 1e20, 1.0 / d).astype(np.float32)
        oiv = (o * inv).astype(np.float32)
        t = np.full(o.shape[0], 1e30, np.float32)
        iv = lv = 0
        cur, stack = 0, []
        while cur is not None:
            if cur >= 0:
                iv += 1
                kids = unspool(slab_chit(cur, inv, oiv, t), int(metas[cur]))
                if kids:
                    cur = kids[0]
                    if kids[1:]:
                        stack.append(kids[1:])
                    continue
            else:
                lv += 1
                tm, any_ok = leaf_tmin(~cur, o, d, t)
                t = np.where(any_ok, np.minimum(t, tm), t)
            cur = None
            while stack:
                top = stack[-1]
                cur = top.pop(0)
                if not top:
                    stack.pop()
                break
        return iv, lv, t

    return sim_union


def wavefronts():
    """(name, origins, dirs) packets: primary tiles, sorted bounce, anyhit-
    style feelers — built once, shared by both policies."""
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from cuda_pathtracer_tpu.core import camera as cam_mod
    W, H = 640, 480
    B = W * H
    cam = cam_mod.Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
    lanes = np.arange(B)
    tpr = W // 16
    g, wl = lanes // 128, lanes % 128
    xs = (g % tpr) * 16 + wl % 16
    ys = (g // tpr) * 8 + wl // 16
    ro, rd = cam_mod.generate_rays_simple(cam, jnp.asarray(xs),
                                          jnp.asarray(ys), W, H)
    ron, rdn = np.asarray(ro, np.float32), np.asarray(rd, np.float32)
    yield 'primary', ron, rdn

    # bounce: hit points of a greedy-table walk + cosine hemisphere dirs,
    # morton+octant sorted (the engine's key)
    rows = build('greedy')
    walk = make_walker(rows)
    rng = np.random.default_rng(5)
    pick = rng.choice(B // 128, size=4 * NP_, replace=False)
    os_, ds_ = [], []
    for p in pick:
        sl = slice(p * 128, (p + 1) * 128)
        _, _, t = walk(ron[sl], rdn[sl])
        hitm = t < 1e29
        hp = ron[sl] + t[:, None] * rdn[sl]
        r1, r2 = rng.random(128), rng.random(128)
        st, ph = np.sqrt(r1), 2 * np.pi * r2
        d = np.stack([st * np.cos(ph), st * np.sin(ph),
                      np.sqrt(1 - r1)], axis=1).astype(np.float32)
        d[:, 1] = np.abs(d[:, 1])   # rough hemisphere up
        os_.append(hp[hitm])
        ds_.append(d[hitm])
    o = np.concatenate(os_)
    d = np.concatenate(ds_)
    # morton+octant sort (coarse 5-bit morton major, octant minor)
    lo, hi = o.min(0), o.max(0)
    q = ((o - lo) / np.maximum(hi - lo, 1e-9) * 31).astype(np.int64)

    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        return (v | (v << 2)) & 0x09249249

    mort = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    octa = ((d[:, 0] > 0) | ((d[:, 1] > 0) << 1)
            | ((d[:, 2] > 0) << 2)).astype(np.int64)
    om = np.argsort((mort << 3) | octa, kind='stable')
    yield 'bounce', o[om], d[om]


def main():
    waves = list(wavefronts())
    for policy in ('greedy', 'dp'):
        rows = build(policy)
        walk = make_walker(rows)
        print(f'--- {policy}: {rows.shape[0]} rows')
        for name, o, d in waves:
            rng = np.random.default_rng(1)
            npk = min(NP_, o.shape[0] // 128)
            pick = rng.choice(o.shape[0] // 128, size=npk, replace=False)
            IV = LV = 0
            for p in pick:
                sl = slice(p * 128, (p + 1) * 128)
                iv, lv, _ = walk(o[sl], d[sl])
                IV += iv
                LV += lv
            nr = npk * 128
            ns = (IV * C_INNER + LV * C_LEAF) / nr
            print(f'  {name:8s}: inner {IV/npk:7.2f} leaf {LV/npk:7.2f} '
                  f'/packet; visits/ray {(IV+LV)/nr:6.3f}; '
                  f'projected {ns:6.1f} ns/ray')


if __name__ == '__main__':
    main()
