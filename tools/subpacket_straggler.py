"""Straggler factor for the v3 shared-step subpacket design.

A v3 cell runs NGROUP=8 width-16 subpackets in lockstep: each step serves one
node visit per *live* group, so the cell's step count is max(group steps), not
mean. This measures, on the real sorted sibenik bounce wavefront, the ratio

    straggler = 8 * max(subpacket steps) / sum(subpacket steps)

for (a) the 8 subpackets of one sorted 128-ray packet and (b) a best-case
re-bucketing where the frame's subpackets are sorted by step count first
(upper bound on what smarter grouping could recover).

Usage: PYTHONPATH=/root/repo python tools/subpacket_straggler.py
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, os.path.dirname(__file__) + '/..')
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.core import camera as cam_mod
from cuda_pathtracer_tpu.ops import traverse_packet as tpk
import cuda_pathtracer_tpu.models.pathtracer as ptm
from cuda_pathtracer_tpu.ops.traverse_wide import traverse_wide

scene = get_scene('sibenik', asset_dirs=['/root/reference', '.'])
arrays, dyn = scene.to_device(), scene.dynamic_arrays()
cam = cam_mod.Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
W, H = 1920, 192
ys, xs = np.mgrid[0:H, 0:W]
B = W * H
ro, rd = cam_mod.generate_rays_simple(
    cam, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()), W, 1080)
tables = tpk.split_packet_tables(np.asarray(dyn.wide_rows), scene.wide_depth)
inner = np.asarray(tables.inner)
leaf = np.asarray(tables.leaf)
refs_all = inner[:, tpk.PREFS:tpk.PREFS + 16].view(np.int32)


def count_steps(ro_np, rd_np):
    with np.errstate(divide='ignore'):
        inv = 1.0 / rd_np
    inv = np.clip(inv, -1e30, 1e30)
    n = len(ro_np)
    t = np.full(n, 3.0e38, np.float32)
    cur, mask, stack = 0, 0, []
    steps = 0
    while True:
        steps += 1
        if cur < 0:
            row = leaf[~cur]
            tr = row[:108].reshape(9, 12)
            v0 = tr[0:3].T; e1 = tr[3:6].T; e2 = tr[6:9].T
            h = np.cross(rd_np[:, None, :], e2[None])
            a = (e1[None] * h).sum(-1)
            f = 1.0 / np.where(np.abs(a) < 1e-4, 1.0, a)
            s = ro_np[:, None, :] - v0[None]
            u = f * (s * h).sum(-1)
            q = np.cross(s, e1[None])
            v = f * (rd_np[:, None, :] * q).sum(-1)
            tt = f * (e2[None] * q).sum(-1)
            ok = ((np.abs(a) >= 1e-4) & (u >= 0) & (u <= 1) & (v >= 0)
                  & (u + v <= 1) & (tt > 0) & (tt < t[:, None]))
            t = np.where(ok.any(1),
                         np.minimum(t, np.where(ok, tt, 3e38).min(1)), t)
            cur = None
        else:
            row = inner[cur]
            box = row[:96].reshape(6, 16)
            with np.errstate(invalid='ignore'):
                t0x = (box[0][None] - ro_np[:, 0:1]) * inv[:, 0:1]
                t1x = (box[3][None] - ro_np[:, 0:1]) * inv[:, 0:1]
                t0y = (box[1][None] - ro_np[:, 1:2]) * inv[:, 1:2]
                t1y = (box[4][None] - ro_np[:, 1:2]) * inv[:, 1:2]
                t0z = (box[2][None] - ro_np[:, 2:3]) * inv[:, 2:3]
                t1z = (box[5][None] - ro_np[:, 2:3]) * inv[:, 2:3]
                tmin = np.maximum(np.maximum(np.minimum(t0x, t1x),
                                             np.minimum(t0y, t1y)),
                                  np.minimum(t0z, t1z))
                tmax = np.minimum(np.minimum(np.maximum(t0x, t1x),
                                             np.maximum(t0y, t1y)),
                                  np.maximum(t0z, t1z))
                chit = (tmax >= np.maximum(tmin, 0)) & (tmin < t[:, None])
            chit &= ((mask >> np.arange(16)) & 1) == 0
            chit = np.where(np.isnan(tmin), False, chit)
            anyc = chit.any(0)
            if anyc.any():
                pc = np.where(chit, tmin, 3e38).min(0)
                sel = int(np.argmin(np.where(anyc, pc, 3e38)))
                if anyc.sum() > 1:
                    stack.append((cur, mask | (1 << sel)))
                cur, mask = int(refs_all[cur, sel]), 0
                continue
            cur = None
        if cur is None:
            if stack:
                cur, mask = stack.pop()
            else:
                break
    return steps


ron, rdn = np.asarray(ro), np.asarray(rd)
rng = np.random.default_rng(7)
d2 = rng.normal(size=(B, 3)).astype(np.float32)
d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
flip = (d2 * rdn).sum(1) > 0
d2[flip] = -d2[flip]

wd = -(-scene.wide_depth // 4) * 4
hitw = jax.jit(lambda a, b: traverse_wide(
    arrays, dyn.wide_rows, wd, a, b))(ro, rd)
tn = np.asarray(hitw.t)
hp = (ron + rdn * (np.minimum(tn, 100.0)[:, None] - 1e-3)).astype(np.float32)

order = np.asarray(ptm._sort_order(jnp.asarray(hp), jnp.asarray(d2),
                                   dyn.bounds, direction_major=True))
hps, d2s = hp[order], d2[order]

K = int(os.environ.get('STRAG_K', '24'))
gs = rng.integers(0, B // 128, K)
sub_steps = []          # (packet, 8) per-subpacket step counts
for g in gs:
    sel = slice(g * 128, (g + 1) * 128)
    o128, dd128 = hps[sel], d2s[sel]
    sub_steps.append([count_steps(o128[j:j + 16], dd128[j:j + 16])
                      for j in range(0, 128, 16)])
ss = np.asarray(sub_steps, np.float64)            # (K, 8)

v2_steps = np.asarray([count_steps(hps[g * 128:(g + 1) * 128],
                                   d2s[g * 128:(g + 1) * 128]) for g in gs],
                      np.float64)

lockstep = 8 * ss.max(1)
work = ss.sum(1)
print(f'width-16 subpackets of sorted 128-packets (K={K}):')
print(f'  per-subpacket steps: mean={ss.mean():6.1f} min={ss.min():.0f} '
      f'max={ss.max():.0f}')
print(f'  sum(8 subpackets):   mean={work.mean():6.1f}')
print(f'  8*max (lockstep):    mean={lockstep.mean():6.1f}')
print(f'  straggler factor:    mean={np.mean(lockstep/work):.3f}  '
      f'p90={np.quantile(lockstep/work, 0.9):.3f}')
print(f'  v2 128-wide steps:   mean={v2_steps.mean():6.1f}')
print(f'  visit inflation (work/v2): {work.mean()/v2_steps.mean():.2f}x; '
      f'lockstep inflation: {lockstep.mean()/v2_steps.mean():.2f}x')

# best case: re-bucket the sampled subpackets by sorted step count
flat = np.sort(ss.ravel())[::-1]
gmax = flat.reshape(-1, 8).max(1)
print(f'  re-bucketed lockstep inflation: '
      f'{8*gmax.sum()/work.sum() * work.mean()/v2_steps.mean():.2f}x '
      f'(sorted-by-length grouping upper bound)')
