"""Count traversal steps (while iterations) per block to separate step COUNT
from step COST."""
import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.core import camera as cam_mod
from cuda_pathtracer_tpu.ops import traverse_packet as tpk
from cuda_pathtracer_tpu.ops import intersect as isect

scene = get_scene('sibenik', asset_dirs=['/root/reference', '.'])
arrays, dyn = scene.to_device(), scene.dynamic_arrays()
cam = cam_mod.Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
W, H = 1920, 192
ys, xs = np.mgrid[0:H, 0:W]
B = W * H
ro, rd = cam_mod.generate_rays_simple(
    cam, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()), W, 1080)
tables = tpk.split_packet_tables(np.asarray(dyn.wide_rows), scene.wide_depth)
TH, TW = 8, 16
perm = (np.arange(B).reshape(H // TH, TH, W // TW, TW)
        .transpose(0, 2, 1, 3).reshape(-1))
pj = jnp.asarray(perm)

# monkeypatch a step-counting kernel: reuse internals via a custom while cond
orig_kernel = tpk._kernel
def counting_kernel(npk, d, interpret):
    base = orig_kernel(npk, d, interpret)
    def kernel(itab, ltab, o, dv, iv, t0, soh, live,
               t_out, gid_out, hit_out, stk_n, stk_m, t_s, gid_s, fnd_s, dec_s):
        base(itab, ltab, o, dv, iv, t0, soh, live,
             t_out, gid_out, hit_out, stk_n, stk_m, t_s, gid_s, fnd_s, dec_s)
    return kernel

# simpler: patch while_loop to count via hit_out accumulation is invasive.
# Instead: estimate steps by timing blocks of DIFFERENT sizes? No - count on
# CPU in interpret mode with numpy semantics: run the same traversal in pure
# python over the tables for a few packets.
inner = np.asarray(tables.inner); leaf = np.asarray(tables.leaf)
refs_all = inner[:, tpk.PREFS:tpk.PREFS+16].view(np.int32)

def count_steps(ro_np, rd_np):
    """Pure-numpy packet traversal step counter (per 128-ray packet)."""
    inv = np.asarray(isect.safe_inv_dir(jnp.asarray(rd_np)))
    t = np.full(128, 3.0e38, np.float32)
    cur, mask, stack = 0, 0, []
    steps = leaf_steps = inner_steps = 0
    while True:
        steps += 1
        if cur < 0:
            leaf_steps += 1
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
            ok = (np.abs(a) >= 1e-4) & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (tt > 0) & (tt < t[:, None])
            t = np.where(ok.any(1), np.minimum(t, np.where(ok, tt, 3e38).min(1)), t)
            cur = None
        else:
            inner_steps += 1
            row = inner[cur]
            box = row[:96].reshape(6, 16)
            with np.errstate(invalid='ignore'):
                t0x = (box[0][None] - ro_np[:, 0:1]) * inv[:, 0:1]
                t1x = (box[3][None] - ro_np[:, 0:1]) * inv[:, 0:1]
                t0y = (box[1][None] - ro_np[:, 1:2]) * inv[:, 1:2]
                t1y = (box[4][None] - ro_np[:, 1:2]) * inv[:, 1:2]
                t0z = (box[2][None] - ro_np[:, 2:3]) * inv[:, 2:3]
                t1z = (box[5][None] - ro_np[:, 2:3]) * inv[:, 2:3]
                tmin = np.maximum(np.maximum(np.minimum(t0x, t1x), np.minimum(t0y, t1y)), np.minimum(t0z, t1z))
                tmax = np.minimum(np.minimum(np.maximum(t0x, t1x), np.maximum(t0y, t1y)), np.maximum(t0z, t1z))
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
    return steps, inner_steps, leaf_steps

ron, rdn = np.asarray(ro), np.asarray(rd)
rng = np.random.default_rng(1)
tot = 0
for k in range(8):
    g = rng.integers(0, B // 128)
    sel = perm[g*128:(g+1)*128]
    s, i_, l_ = count_steps(ron[sel], rdn[sel])
    tot += s
    print(f'tile packet {g}: steps={s} (inner {i_}, leaf {l_})')
print('mean steps/packet (8x16 tiles):', tot / 8)

# ---- bounce-packet step counts (appended for the collapse experiments) ----
if __name__ == '__main__' and True:
    import cuda_pathtracer_tpu.models.pathtracer as ptm
    hit = jax.jit(lambda a, b: __import__(
        'cuda_pathtracer_tpu.ops.dispatch', fromlist=['trace']).trace(
        arrays, dyn, a, b, wide_depth=scene.wide_depth))(ro, rd)
    tn = np.asarray(hit.t)
    hp = ron + rdn * (tn[:, None] - 1e-3)
    rng2 = np.random.default_rng(7)
    d2 = rng2.normal(size=(B, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    flip = (d2 * rdn).sum(1) > 0
    d2[flip] = -d2[flip]
    order = np.asarray(ptm._sort_order(jnp.asarray(hp), jnp.asarray(d2),
                                       dyn.bounds, direction_major=True))
    hps, d2s = hp[order], d2[order]
    tot = ti = tl = 0
    K = 10
    for k in range(K):
        g = rng2.integers(0, B // 128)
        s, i_, l_ = count_steps(hps[g*128:(g+1)*128], d2s[g*128:(g+1)*128])
        tot += s; ti += i_; tl += l_
    print(f'bounce packets (dir-sorted): mean steps {tot/K:.1f} '
          f'(inner {ti/K:.1f}, leaf {tl/K:.1f})')
