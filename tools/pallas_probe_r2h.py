"""Probe H: isolate the real packet-step cost. The real kernel runs at
~1.4us/packet-step vs ~15-60ns promised by earlier probes. Variants:
  A both-paths, state carried as (8,128) tiles, scalars via jnp (no SMEM dec)
  B both-paths, state in VMEM scratch (the shipped v1 structure)
  C branch (pl.when) + VMEM scratch + SMEM dec  (the shipped v2 structure)
Scripted next-index, T steps x NPK packets."""
import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')

NI_, NL_ = 6833, 18632
ARITY, LEAF_MAX = 16, 12
BIG = 3.0e38
NPK = 8

def leaf_math(rowL, ox, oy, oz, dx, dy, dz, t_scan):
    def f12(j):
        return jnp.broadcast_to(rowL[j*12:(j+1)*12], (LEAF_MAX, 128))
    v0x, v0y, v0z = f12(0), f12(1), f12(2)
    e1x, e1y, e1z = f12(3), f12(4), f12(5)
    e2x, e2y, e2z = f12(6), f12(7), f12(8)
    hx = dy*e2z - dz*e2y; hy = dz*e2x - dx*e2z; hz = dx*e2y - dy*e2x
    a = e1x*hx + e1y*hy + e1z*hz
    f = 1.0 / jnp.where(jnp.abs(a) < 1e-4, 1.0, a)
    sx = ox-v0x; sy = oy-v0y; sz = oz-v0z
    u = f*(sx*hx + sy*hy + sz*hz)
    qx = sy*e1z - sz*e1y; qy = sz*e1x - sx*e1z; qz = sx*e1y - sy*e1x
    vv = f*(dx*qx + dy*qy + dz*qz)
    tt = f*(e2x*qx + e2y*qy + e2z*qz)
    okm = ((jnp.abs(a) >= 1e-4) & (u >= 0) & (u <= 1) & (vv >= 0)
           & (u+vv <= 1) & (tt > 0) & (tt < t_scan))
    ttm = jnp.where(okm, tt, BIG)
    leaf_t = jnp.min(ttm, axis=0, keepdims=True)
    gids = jnp.broadcast_to(jax.lax.bitcast_convert_type(
        rowL[108:120], jnp.int32), (LEAF_MAX, 128))
    leaf_gid = jnp.min(jnp.where(ttm == leaf_t, gids, jnp.int32(2**30)),
                       axis=0, keepdims=True)
    take = jnp.any(okm, axis=0, keepdims=True)
    return leaf_t, leaf_gid, take

def inner_math(rowI, ox, oy, oz, ivx, ivy, ivz, t_scan, curmask, iota16, bits16):
    def f16(k):
        return jnp.broadcast_to(rowI[k*16:(k+1)*16], (ARITY, 128))
    lox, loy, loz = f16(0), f16(1), f16(2)
    hix, hiy, hiz = f16(3), f16(4), f16(5)
    t0x = (lox-ox)*ivx; t1x = (hix-ox)*ivx
    t0y = (loy-oy)*ivy; t1y = (hiy-oy)*ivy
    t0z = (loz-oz)*ivz; t1z = (hiz-oz)*ivz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                       jnp.minimum(t0z, t1z))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                       jnp.maximum(t0z, t1z))
    chit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < t_scan)
    vis = jnp.bitwise_and(jnp.right_shift(
        jnp.full((ARITY, 128), 1, jnp.int32) * curmask,
        jnp.broadcast_to(iota16, (ARITY, 128))), 1)
    chit = chit & (vis == 0)
    tsel = jnp.where(chit, tmin, BIG)
    pc_min = jnp.min(tsel, axis=1, keepdims=True)
    anyc = jnp.any(chit, axis=1, keepdims=True)
    key = jnp.where(anyc, pc_min, BIG)
    kmin = jnp.min(key, axis=0, keepdims=True)
    iota_sel = jnp.where((key == kmin) & anyc, iota16, ARITY)
    selc = jnp.min(iota_sel)
    sel_onehot = (iota_sel == jnp.broadcast_to(
        jnp.full((1, 1), 1, jnp.int32) * selc, (ARITY, 1))) & anyc
    refs = jax.lax.bitcast_convert_type(rowI[96:112], jnp.int32)
    selref = jnp.sum(jnp.where(sel_onehot, refs, 0))
    selbit = jnp.sum(jnp.where(sel_onehot, bits16, 0))
    nhits = jnp.sum(anyc.astype(jnp.int32))
    return selref, selbit, nhits

def make(T, variant):
    def kernel(itab, ltab, o_ref, dv_ref, iv_ref, t0_ref,
               t_out, stk_n, stk_m, t_s, dec_s):
        iota16 = jax.lax.broadcasted_iota(jnp.int32, (ARITY, 1), 0)
        bits16 = (1 << iota16)
        o = o_ref[:]; dv = dv_ref[:]; iv = iv_ref[:]
        for p in range(NPK):
            stk_n[p, 0] = 0; stk_m[p, 0] = 0
        t_s[:, :] = t0_ref[:]
        prow = [jax.lax.broadcasted_iota(jnp.int32, (NPK, 128), 0) == p
                for p in range(NPK)]

        def body(i, carry):
            curs, masks, sps, t_all = carry
            ncurs, nmasks, nsps = [], [], []
            t_cur = t_all
            for p in range(NPK):
                cur, curmask, sp = curs[p], masks[p], sps[p]
                is_leaf = cur < 0
                op = o[3*p:3*p+3]; dp = dv[3*p:3*p+3]; ip = iv[3*p:3*p+3]
                ox, oy, oz = op[0:1], op[1:2], op[2:3]
                dx, dy, dz = dp[0:1], dp[1:2], dp[2:3]
                ivx, ivy, ivz = ip[0:1], ip[1:2], ip[2:3]
                if variant == 'A':
                    t = t_cur[p:p+1]
                    rowL = jnp.transpose(ltab[pl.ds(jnp.where(is_leaf, ~cur, 0), 1), :])[:, 0:1]
                    rowI = jnp.transpose(itab[pl.ds(jnp.maximum(cur, 0), 1), :])[:, 0:1]
                    leaf_t, leaf_gid, take = leaf_math(rowL, ox, oy, oz, dx, dy, dz, t)
                    take = take & is_leaf
                    t2 = jnp.where(take, jnp.minimum(t, leaf_t), t)
                    selref, selbit, nhits = inner_math(
                        rowI, ox, oy, oz, ivx, ivy, ivz, t2, curmask, iota16, bits16)
                    t_cur = jnp.where(prow[p], jnp.broadcast_to(t2, (NPK, 128)), t_cur)
                elif variant == 'B':
                    t = t_s[p:p+1, :]
                    rowL = jnp.transpose(ltab[pl.ds(jnp.where(is_leaf, ~cur, 0), 1), :])[:, 0:1]
                    rowI = jnp.transpose(itab[pl.ds(jnp.maximum(cur, 0), 1), :])[:, 0:1]
                    leaf_t, leaf_gid, take = leaf_math(rowL, ox, oy, oz, dx, dy, dz, t)
                    take = take & is_leaf
                    t2 = jnp.where(take, jnp.minimum(t, leaf_t), t)
                    t_s[p:p+1, :] = t2
                    selref, selbit, nhits = inner_math(
                        rowI, ox, oy, oz, ivx, ivy, ivz, t2, curmask, iota16, bits16)
                else:  # 'C'
                    @pl.when(is_leaf)
                    def _leaf(p=p, cur=cur):
                        rowL = jnp.transpose(ltab[pl.ds(~cur, 1), :])[:, 0:1]
                        t = t_s[p:p+1, :]
                        leaf_t, leaf_gid, take = leaf_math(
                            rowL, ox, oy, oz, dx, dy, dz, t)
                        t_s[p:p+1, :] = jnp.where(take, jnp.minimum(t, leaf_t), t)
                    @pl.when(~is_leaf)
                    def _inner(p=p, cur=cur, curmask=curmask):
                        rowI = jnp.transpose(itab[pl.ds(cur, 1), :])[:, 0:1]
                        t = t_s[p:p+1, :]
                        sr, sb, nh = inner_math(
                            rowI, ox, oy, oz, ivx, ivy, ivz, t, curmask,
                            iota16, bits16)
                        dec_s[p, 0] = sr; dec_s[p, 1] = sb; dec_s[p, 2] = nh
                    selref, selbit, nhits = dec_s[p, 0], dec_s[p, 1], dec_s[p, 2]

                descend = ~is_leaf & (nhits > 0)
                do_push = descend & (nhits > 1) & (sp < 30)
                @pl.when(do_push)
                def _(p=p, sp=sp, cur=cur, curmask=curmask, selbit=selbit):
                    stk_n[p, sp] = cur
                    stk_m[p, sp] = curmask | selbit
                sp2 = jnp.where(do_push, sp + 1, sp)
                can_pop = ~descend & (sp2 > 0)
                spr = jnp.where(can_pop, sp2 - 1, sp2)
                pn = stk_n[p, spr]; pm = stk_m[p, spr]
                nxt = jnp.where(descend, selref, pn)
                # scripted walk: keep cycling through both tables
                nxt = jnp.where((i + p) % 3 == 0, ~(jnp.abs(nxt) % NL_),
                                jnp.abs(nxt) % NI_)
                ncurs.append(nxt.astype(jnp.int32))
                nmasks.append(jnp.where(descend, 0, pm).astype(jnp.int32))
                nsps.append(jnp.where(can_pop, spr, sp2).astype(jnp.int32))
            return (tuple(ncurs), tuple(nmasks), tuple(nsps), t_cur)

        init = (tuple(jnp.int32(p % 5) for p in range(NPK)),
                tuple(jnp.int32(0) for _ in range(NPK)),
                tuple(jnp.int32(0) for _ in range(NPK)),
                t0_ref[:])
        fin = jax.lax.fori_loop(0, T, body, init)
        t_out[:, :] = fin[3] + t_s[:, :]
    return kernel

itab = jnp.asarray(np.random.rand(NI_, 128)*10-5, jnp.float32)
ltab = jnp.asarray(np.random.rand(NL_, 128)*10-5, jnp.float32)
o = jnp.asarray(np.random.rand(3*NPK, 128), jnp.float32)
dd = jnp.asarray(np.random.rand(3*NPK, 128)+0.1, jnp.float32)
iv = jnp.asarray(np.random.rand(3*NPK, 128)+0.5, jnp.float32)
t0 = jnp.full((NPK, 128), BIG, jnp.float32)

for variant in ('A', 'B', 'C'):
    for T in (256, 2048):
        f = pl.pallas_call(
            make(T, variant),
            out_shape=jax.ShapeDtypeStruct((NPK, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((NPK, 32), jnp.int32),
                            pltpu.SMEM((NPK, 32), jnp.int32),
                            pltpu.VMEM((NPK, 128), jnp.float32),
                            pltpu.SMEM((NPK, 4), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120*1024*1024))
        try:
            g = jax.jit(f)
            out = g(itab, ltab, o, dd, iv, t0); _ = np.asarray(out[:1])
            best = 1e9
            for _ in range(4):
                tt0 = time.perf_counter()
                out = g(itab, ltab, o, dd, iv, t0); _ = np.asarray(out[:1])
                best = min(best, time.perf_counter() - tt0)
            if T == 256:
                a = best
            else:
                slope = (best - a) * 1e9 / (2048 - 256) / NPK
                print(f'variant {variant}: {slope:8.1f} ns/packet-step')
        except Exception as e:
            lines = [l for l in str(e).split('\n')
                     if 'Not implemented' in l or 'Mosaic f' in l or 'rror' in l]
            print(f'variant {variant} T={T} FAIL', [l[-80:] for l in lines[:1]])
            break
