"""Price SUPER-PACKETS (256/512 rays sharing one BVH walk) on the COHERENT
interactive wavefronts by exact kernel-semantics union simulation.

The interactive frame's cost is now dominated by the two coherent kernel
calls (primary closest 16.9 ms + bounce-0 shadow any-hit 15.8 ms at 640x480,
tools/interactive_profile.py round 4). Those traversals are SHORT (~11 union
steps per 128-ray tile packet) and run at the per-visit decision wall, so
the per-RAY cost shrinks ~Kx if K tiles share one walk — IF the union of K
adjacent tiles doesn't blow up the visit count. This sim measures exactly
that: union visits per ray for 1/2/4 adjacent 8x16 tiles per walk.

Projected step cost model (kernel_lab3, measured): a v2 step is ~433 ns of
which the fetch+transpose+decision chain (~300 ns) is per-STEP and the
6-broadcast+slab block (~70-130 ns) is per-TILE. Per-tile Moller leaf cost
scales similarly.

Usage: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/superpacket_sim.py [npackets]
"""
import os
import sys

import numpy as np
import jax

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, os.path.dirname(__file__) + '/..')

from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.core import camera as cam_mod
from cuda_pathtracer_tpu.ops import traverse_packet2 as tpk2
from cuda_pathtracer_tpu.ops.traverse_packet import PBOX0, PTRIS
from cuda_pathtracer_tpu.ops.traverse_packet2 import PMETA, META_BASE_BITS
from cuda_pathtracer_tpu.accel.wide import ARITY, LEAF_MAX

NP_ = int(sys.argv[1]) if len(sys.argv) > 1 else 128

scene = get_scene('sibenik', asset_dirs=['/root/reference', '.'])
dyn = scene.dynamic_arrays()
merged = tpk2.build_merged_table(np.asarray(dyn.wide_rows), scene.wide_depth)
rows = np.asarray(merged.rows)
boxes = rows[:, PBOX0:PBOX0 + 96].reshape(-1, 6, ARITY)
metas = rows[:, PMETA].view(np.int32)
tris = rows[:, PTRIS:PTRIS + 9 * LEAF_MAX].reshape(-1, 9, LEAF_MAX)

cam = cam_mod.Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
W, H = 640, 480
B = W * H
import jax.numpy as jnp
# tile-order lanes exactly like the engine
lanes = np.arange(B)
tpr = W // 16
g, wl = lanes // 128, lanes % 128
xs = (g % tpr) * 16 + wl % 16
ys = (g // tpr) * 8 + wl // 16
ro, rd = cam_mod.generate_rays_simple(
    cam, jnp.asarray(xs), jnp.asarray(ys), W, H)
ron, rdn = np.asarray(ro, np.float32), np.asarray(rd, np.float32)


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
    """v2 multi-push walk: returns (inner visits, leaf visits)."""
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
    return iv, lv


def run(label, width):
    """width = rays per walk (multiple of 128, adjacent tiles)."""
    rng = np.random.default_rng(0)
    n_groups = B // width
    pick = rng.choice(n_groups, size=min(NP_, n_groups), replace=False)
    IV = LV = 0
    for p in pick:
        sl = slice(p * width, (p + 1) * width)
        iv, lv = sim_union(ron[sl], rdn[sl])
        IV += iv
        LV += lv
    nrays = len(pick) * width
    k = width // 128
    # measured cost model: per-step fixed ~300 ns (fetch+transpose+decision)
    # + per-tile slab ~130 ns (inner) / Moller ~310 ns (leaf, prod 12-tri)
    ns = IV * (300 + 130 * k) + LV * (300 + 310 * k)
    print(f'{label:14s} width={width:4d}: inner {IV/len(pick):7.1f} leaf '
          f'{LV/len(pick):6.1f} /walk; visits/ray {(IV+LV)/nrays:6.3f}; '
          f'projected {ns/nrays:6.1f} ns/ray')


for width in (128, 256, 512, 1024):
    run('primary', width)
