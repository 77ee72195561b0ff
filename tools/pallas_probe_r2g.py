"""Probe G: the REAL packet-traversal step body, timing + lowering check.
Transposed orientation: row (1,128) -> rowT (128,1); static sublane slices
give [16,1] box fields and [12,1] tri fields; rays on lanes [1,128].
Fake scripted next-index; measures ns/step for NPK interleaved packets."""
import time, functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')

N = 25600
ARITY, LEAF_MAX = 16, 12
BOX0, REFS0, TRIS0, GIDS0 = 1, 97, 1, 109
BIG = 3.0e38

def make(T, NPK, leaf_frac):
    def kernel(tab_ref, o_ref, inv_ref, d_ref, t_out, gid_out, stk_n, stk_m):
        o = o_ref[:]; inv = inv_ref[:]; d = d_ref[:]
        iota16 = jax.lax.broadcasted_iota(jnp.int32, (ARITY, 1), 0)
        iota12 = jax.lax.broadcasted_iota(jnp.int32, (LEAF_MAX, 1), 0)
        bits16 = (1 << iota16)

        def body(i, carry):
            curs, masks, sps, ts, bests = carry
            n_curs, n_masks, n_sps, n_ts, n_bests = [], [], [], [], []
            for p in range(NPK):
                cur, curmask, sp = curs[p], masks[p], sps[p]
                t, best = ts[p], bests[p]
                op = o[3*p:3*p+3]; ip = inv[3*p:3*p+3]; dp = d[3*p:3*p+3]
                rowv = tab_ref[pl.ds(cur, 1), :]          # (1,128)
                rowT = jnp.transpose(rowv)                 # (128,1)
                tag = rowT[0:1, 0:1]                       # (1,1)
                tag_i = tag.astype(jnp.int32)
                tag_l = jnp.broadcast_to(tag, (1, 128))        # (1,1)->(1,128)
                leaf12 = jnp.broadcast_to(tag_l, (LEAF_MAX, 128)) < 0
                inner16 = jnp.broadcast_to(tag_l, (ARITY, 128)) > 0
                # ---- leaf path: 12 MT tests, field-major slices ----
                def f12(j):
                    return jnp.broadcast_to(rowT[TRIS0+j*12:TRIS0+(j+1)*12],
                                            (LEAF_MAX, 128))
                v0x, v0y, v0z = f12(0), f12(1), f12(2)
                v1x, v1y, v1z = f12(3), f12(4), f12(5)
                v2x, v2y, v2z = f12(6), f12(7), f12(8)
                e1x = v1x - v0x; e1y = v1y - v0y; e1z = v1z - v0z
                e2x = v2x - v0x; e2y = v2y - v0y; e2z = v2z - v0z
                dx, dy, dz = dp[0:1], dp[1:2], dp[2:3]     # [1,128]
                ox, oy, oz = op[0:1], op[1:2], op[2:3]
                hx = dy*e2z - dz*e2y; hy = dz*e2x - dx*e2z; hz = dx*e2y - dy*e2x
                a = e1x*hx + e1y*hy + e1z*hz               # [12,128]
                f = 1.0 / jnp.where(jnp.abs(a) < 1e-9, 1.0, a)
                sx = ox - v0x; sy = oy - v0y; sz = oz - v0z
                u = f * (sx*hx + sy*hy + sz*hz)
                qx = sy*e1z - sz*e1y; qy = sz*e1x - sx*e1z; qz = sx*e1y - sy*e1x
                v = f * (dx*qx + dy*qy + dz*qz)
                tt = f * (e2x*qx + e2y*qy + e2z*qz)
                okm = (jnp.abs(a) >= 1e-9) & (u >= 0) & (u <= 1) & (v >= 0) \
                    & (u + v <= 1) & (tt > 1e-4) & (tt < t) & leaf12
                ttm = jnp.where(okm, tt, BIG)
                leaf_t = jnp.min(ttm, axis=0, keepdims=True)   # [1,128]
                gids = jnp.broadcast_to(jax.lax.bitcast_convert_type(
                    rowT[GIDS0:GIDS0+12], jnp.int32), (LEAF_MAX, 128))
                leaf_gid = jnp.min(jnp.where(ttm == leaf_t, gids, 2**30),
                                   axis=0, keepdims=True)
                leaf_found = jnp.any(okm, axis=0, keepdims=True)
                t2 = jnp.where(leaf_found, jnp.minimum(t, leaf_t), t)
                best2 = jnp.where(leaf_found & (leaf_t < t), leaf_gid, best)
                # ---- inner path: 16 slab tests ----
                def f16(k):
                    return jnp.broadcast_to(rowT[BOX0+k*16:BOX0+(k+1)*16],
                                            (ARITY, 128))
                lox, loy, loz = f16(0), f16(1), f16(2)
                hix, hiy, hiz = f16(3), f16(4), f16(5)
                ivx, ivy, ivz = ip[0:1], ip[1:2], ip[2:3]
                t0x = (lox - ox) * ivx; t1x = (hix - ox) * ivx
                t0y = (loy - oy) * ivy; t1y = (hiy - oy) * ivy
                t0z = (loz - oz) * ivz; t1z = (hiz - oz) * ivz
                tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                               jnp.minimum(t0y, t1y)),
                                   jnp.minimum(t0z, t1z))    # [16,128]
                tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                               jnp.maximum(t0y, t1y)),
                                   jnp.maximum(t0z, t1z))
                chit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < t2)
                chit = chit & inner16
                chit = chit & (jnp.broadcast_to(iota16.astype(jnp.float32), (ARITY, 128)) < jnp.broadcast_to(tag_l, (ARITY, 128)))
                vis = jnp.bitwise_and(jnp.right_shift(
                    jnp.full((ARITY, 128), 1, jnp.int32) * curmask,
                    jnp.broadcast_to(iota16, (ARITY, 128))), 1)
                chit = chit & (vis == 0)
                tsel = jnp.where(chit, tmin, BIG)
                pc_min = jnp.min(tsel, axis=1, keepdims=True)  # [16,1]
                anyc = jnp.any(chit, axis=1, keepdims=True)
                key = jnp.where(anyc, pc_min, BIG)
                kmin = jnp.min(key, axis=0, keepdims=True)     # (1,1); [16,1] cmp is 1-dim bcast
                selhot = (key == kmin) & anyc
                refs = jax.lax.bitcast_convert_type(
                    rowT[REFS0:REFS0+16], jnp.int32)
                selc = jnp.min(jnp.where(selhot, iota16, ARITY))
                selref = jnp.max(jnp.where(selhot, refs, 0))
                selbit = jnp.max(jnp.where(selhot, bits16, 0))
                nhits = jnp.sum(anyc.astype(jnp.int32))
                # ---- scalar crossings (one drain) ----
                s_isleaf = tag_i[0, 0] < 0
                s_nhits = nhits
                s_selref = selref
                s_selbit = selbit
                descend = jnp.logical_not(s_isleaf) & (s_nhits > 0)
                do_push = descend & (s_nhits > 1)
                @pl.when(do_push & (sp < 30))
                def _(p=p, sp=sp, cur=cur):
                    stk_n[p, sp] = cur
                    stk_m[p, sp] = curmask | s_selbit
                sp2 = jnp.where(do_push & (sp < 30), sp + 1, sp)
                can_pop = jnp.logical_not(descend) & (sp2 > 0)
                sp3 = jnp.where(can_pop, sp2 - 1, sp2)
                pn = stk_n[p, sp3]
                pm = stk_m[p, sp3]
                # scripted walk to keep the loop busy regardless of data
                nxt = jnp.where(descend, s_selref, pn)
                nxt = (jnp.abs(nxt) + i) % N
                nmask = jnp.where(descend, 0, pm)
                n_curs.append(nxt.astype(jnp.int32))
                n_masks.append(nmask.astype(jnp.int32))
                n_sps.append(sp3.astype(jnp.int32))
                n_ts.append(t2)
                n_bests.append(best2)
            return (tuple(n_curs), tuple(n_masks), tuple(n_sps),
                    tuple(n_ts), tuple(n_bests))

        init = (tuple(jnp.int32(p) for p in range(NPK)),
                tuple(jnp.int32(0) for _ in range(NPK)),
                tuple(jnp.int32(0) for _ in range(NPK)),
                tuple(jnp.full((1, 128), BIG, jnp.float32) for _ in range(NPK)),
                tuple(jnp.full((1, 128), -1, jnp.int32) for _ in range(NPK)))
        for p in range(NPK):
            stk_n[p, 0] = 0
            stk_m[p, 0] = 0
        fin = jax.lax.fori_loop(0, T, body, init)
        for p in range(NPK):
            t_out[p:p+1, :] = fin[3][p]
            gid_out[p:p+1, :] = fin[4][p]
    return kernel

rows = np.zeros((N, 128), np.float32)
# half inner-ish, half leaf-ish rows with plausible values
rows[:, 0] = np.where(np.random.rand(N) < 0.5, 8.0, -10.0)
rows[:, 1:97] = np.random.rand(N, 96) * 20 - 10
rows[:, 97:121] = np.frombuffer(
    np.random.randint(0, N, size=(N, 24), dtype=np.int32).tobytes(),
    np.float32).reshape(N, 24)
tab = jnp.asarray(rows)

T = 16384
for NPK in (1, 2, 4):
    o = jnp.asarray(np.random.rand(3*NPK, 128)*2-1, jnp.float32)
    iv = jnp.asarray(np.random.rand(3*NPK, 128)+0.5, jnp.float32)
    dd = jnp.asarray(np.random.rand(3*NPK, 128)*2-1, jnp.float32)
    f = pl.pallas_call(
        make(T, NPK, 0.5),
        out_shape=(jax.ShapeDtypeStruct((NPK, 128), jnp.float32),
                   jax.ShapeDtypeStruct((NPK, 128), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.SMEM((NPK, 32), jnp.int32),
                        pltpu.SMEM((NPK, 32), jnp.int32)])
    try:
        g = jax.jit(f)
        out = g(tab, o, iv, dd); _ = np.asarray(out[0][:1])
        best = 1e9
        for _t in range(4):
            t0c = time.perf_counter()
            out = g(tab, o, iv, dd); _ = np.asarray(out[0][:1])
            best = min(best, time.perf_counter() - t0c)
        print(f'NPK={NPK}: {best*1e9/T:7.1f} ns/step = '
              f'{best*1e9/T/NPK:6.1f} ns/packet-step  (total {best*1e3:.1f} ms)')
    except Exception as e:
        lines = [l for l in str(e).split('\n') if l.strip()]
        key = [l for l in lines if 'Mosaic failed' in l or 'Not implemented' in l
               or 'nsupported' in l][:3]
        print(f'NPK={NPK} FAIL:', key if key else lines[:2])
