"""Sweep packet sort keys for bounce wavefronts: mean union steps per packet
(numpy traversal model) — cheaper than TPU benches for ranking keys."""
import numpy as np, jax, jax.numpy as jnp
import os
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.core import camera as cam_mod
from cuda_pathtracer_tpu.ops import traverse_packet as tpk
from cuda_pathtracer_tpu.ops.dispatch import trace
from cuda_pathtracer_tpu.ops import intersect as isect

scene = get_scene('sibenik', asset_dirs=['/root/reference', '.'])
arrays, dyn = scene.to_device(), scene.dynamic_arrays()
cam = cam_mod.Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
W, H = 1920, 192
B = W * H
ys, xs = np.mgrid[0:H, 0:W]
ro, rd = cam_mod.generate_rays_simple(
    cam, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()), W, 1080)
ron, rdn = np.asarray(ro), np.asarray(rd)
inner = np.asarray(dyn.packet_inner); leaf = np.asarray(dyn.packet_leaf)
refs_all = inner[:, tpk.PREFS:tpk.PREFS+16].view(np.int32)

hit = jax.jit(lambda a, b: trace(arrays, dyn, a, b, wide_depth=scene.wide_depth))(ro, rd)
tn = np.asarray(hit.t)
hp = ron + rdn * (tn[:, None] - 1e-3)
rng = np.random.default_rng(7)
d2 = rng.normal(size=(B, 3)).astype(np.float32)
d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
flip = (d2 * rdn).sum(1) > 0
d2[flip] = -d2[flip]

def count_steps(ro_np, rd_np):
    inv = np.asarray(isect.safe_inv_dir(jnp.asarray(rd_np)))
    t = np.full(128, 3.0e38, np.float32)
    cur, mask, stack = 0, 0, []
    steps = 0
    while True:
        steps += 1
        if steps > 4000: break
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
            tt = f * ((e2[None]) * q).sum(-1)
            ok = (np.abs(a) >= 1e-4) & (u >= 0) & (u <= 1) & (v >= 0) & (u+v <= 1) & (tt > 0) & (tt < t[:, None])
            t = np.where(ok.any(1), np.minimum(t, np.where(ok, tt, 3e38).min(1)), t)
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
                tmin = np.maximum(np.maximum(np.minimum(t0x,t1x), np.minimum(t0y,t1y)), np.minimum(t0z,t1z))
                tmax = np.minimum(np.minimum(np.maximum(t0x,t1x), np.maximum(t0y,t1y)), np.maximum(t0z,t1z))
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

bmin = np.asarray(dyn.bounds)[0]; bext = np.asarray(dyn.bounds)[1]

def spread(v):
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v

def morton(p, bits):
    q = np.clip((p - bmin) / bext, 0, 1)
    q = (q * ((1 << bits) - 1)).astype(np.int64)
    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)

def dirkey(d, ubits):
    ax = np.abs(d)
    face = np.argmax(ax, axis=1)
    m = ax.max(1) + 1e-20
    neg = np.take_along_axis(d, face[:, None], 1)[:, 0] < 0
    u = np.take_along_axis(d, ((face+1) % 3)[:, None], 1)[:, 0] / m
    v = np.take_along_axis(d, ((face+2) % 3)[:, None], 1)[:, 0] / m
    qu = np.clip(((u+1)/2 * ((1 << ubits)-1)).astype(np.int64), 0, (1 << ubits)-1)
    qv = np.clip(((v+1)/2 * ((1 << ubits)-1)).astype(np.int64), 0, (1 << ubits)-1)
    return (((face.astype(np.int64) << 1) | neg) << (2*ubits)) | (qu << ubits) | qv

variants = {
    'dir7 + morton24 (current)': (dirkey(d2, 2) << 24) | (morton(hp, 8) ),
    'dir13 + morton18'         : (dirkey(d2, 5) << 18) | (morton(hp, 6)),
    'dir9  + morton21'         : (dirkey(d2, 3) << 21) | (morton(hp, 7)),
    'morton24 + dir7'          : (morton(hp, 8) << 7) | dirkey(d2, 2),
    'morton15 + dir13'         : (morton(hp, 5) << 13) | dirkey(d2, 5),
    'unsorted'                 : np.arange(B, dtype=np.int64),
}
rng2 = np.random.default_rng(11)
samp = rng2.integers(0, B // 128, 12)
for name, key in variants.items():
    order = np.argsort(key, kind='stable')
    h2, dd2 = hp[order], d2[order]
    tot = sum(count_steps(h2[g*128:(g+1)*128], dd2[g*128:(g+1)*128])
              for g in samp)
    print(f'{name}: mean steps {tot/len(samp):.1f}')
