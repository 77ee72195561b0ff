"""Kernel lab: ablate the REAL packet-traversal kernel on REAL sibenik
wavefronts to find where the ~2.6us/iteration goes (probe H's scripted
variant C costs ~1.0us/iteration, so ~1.6us is unexplained by vector work).

Variants (env CPT_KVAR or --all):
  v0       shipped kernel (traverse_packet._kernel)
  script   real fetch+vector work, decision SCRIPTED (no dec dependency):
           measures the floor without the vector->scalar sync chain
  nodec    inner branch skips the dec reductions/writes (decision garbage,
           traversal still terminates by step cap): isolates reduction cost
  packed   single packed dec word instead of 3 (1 SMEM sync, not 3)
  phase    vector phases for all packets first, then all scalar decisions
Usage: PYTHONPATH=... JAX_PLATFORMS=axon python tools/kernel_lab.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(__file__) + '/..')
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.core import camera as cam_mod
from cuda_pathtracer_tpu.ops import traverse_packet as tpk
from cuda_pathtracer_tpu.ops import intersect as isect

ARITY, LEAF_MAX = 16, 12
PBOX0, PREFS, PTRIS, PGIDS = tpk.PBOX0, tpk.PREFS, tpk.PTRIS, tpk.PGIDS
RAY_ROWS, PACKET, DONE, BIG = tpk.RAY_ROWS, tpk.PACKET, tpk.DONE, tpk.BIG
MT_DET_EPS = tpk.MT_DET_EPS
NPK = 2


def variant_kernel(variant: str, d: int):
    """A copy of traverse_packet._kernel with ablation hooks."""
    def kernel(itab_ref, ltab_ref, rays_ref, t_out, stk_n, stk_m,
               t_s, gid_s, fnd_s, dec_s):
        iota16 = jax.lax.broadcasted_iota(jnp.int32, (ARITY, 1), 0)
        bits16 = (1 << iota16)
        rays = rays_ref[:]

        def vector_phase(p, cur, curmask, sp):
            is_leaf = cur < 0
            alive = cur != DONE
            b = p * RAY_ROWS
            ox, oy, oz = rays[b + 0:b + 1], rays[b + 1:b + 2], rays[b + 2:b + 3]
            dx, dy, dz = rays[b + 3:b + 4], rays[b + 4:b + 5], rays[b + 5:b + 6]
            ivx, ivy, ivz = (rays[b + 6:b + 7], rays[b + 7:b + 8],
                             rays[b + 8:b + 9])
            livep = rays[b + 10:b + 11] != 0.0
            sohp = rays[b + 11:b + 12] != 0.0

            @pl.when(alive & is_leaf)
            def _leaf():
                rowL = jnp.transpose(ltab_ref[pl.ds(~cur, 1), :])
                t = t_s[p:p + 1, :]
                best = gid_s[p:p + 1, :]
                found = fnd_s[p:p + 1, :] != 0
                t_scan = jnp.where(livep & ~(sohp & found), t, -BIG)

                def f12(j):
                    return jnp.broadcast_to(
                        rowL[PTRIS + j * 12:PTRIS + (j + 1) * 12],
                        (LEAF_MAX, 128))
                v0x, v0y, v0z = f12(0), f12(1), f12(2)
                e1x, e1y, e1z = f12(3), f12(4), f12(5)
                e2x, e2y, e2z = f12(6), f12(7), f12(8)
                hx = dy * e2z - dz * e2y
                hy = dz * e2x - dx * e2z
                hz = dx * e2y - dy * e2x
                a = e1x * hx + e1y * hy + e1z * hz
                f = 1.0 / jnp.where(jnp.abs(a) < MT_DET_EPS, 1.0, a)
                sx = ox - v0x; sy = oy - v0y; sz = oz - v0z
                u = f * (sx * hx + sy * hy + sz * hz)
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                vv = f * (dx * qx + dy * qy + dz * qz)
                tt = f * (e2x * qx + e2y * qy + e2z * qz)
                okm = ((jnp.abs(a) >= MT_DET_EPS) & (u >= 0.0) & (u <= 1.0)
                       & (vv >= 0.0) & (u + vv <= 1.0)
                       & (tt > 0.0) & (tt < t_scan))
                ttm = jnp.where(okm, tt, BIG)
                leaf_t = jnp.min(ttm, axis=0, keepdims=True)
                gids = jnp.broadcast_to(jax.lax.bitcast_convert_type(
                    rowL[PGIDS:PGIDS + LEAF_MAX], jnp.int32), (LEAF_MAX, 128))
                leaf_gid = jnp.min(jnp.where(ttm == leaf_t, gids,
                                             jnp.int32(2 ** 30)),
                                   axis=0, keepdims=True)
                take = jnp.any(okm, axis=0, keepdims=True)
                t_s[p:p + 1, :] = jnp.where(take, jnp.minimum(t, leaf_t), t)
                gid_s[p:p + 1, :] = jnp.where(take & (leaf_t < t), leaf_gid,
                                              best)
                fnd_s[p:p + 1, :] = (found | take).astype(jnp.int32)

            @pl.when(alive & ~is_leaf)
            def _inner():
                rowI = jnp.transpose(itab_ref[pl.ds(cur, 1), :])
                t = t_s[p:p + 1, :]
                found = fnd_s[p:p + 1, :] != 0
                t_scan = jnp.where(livep & ~(sohp & found), t, -BIG)

                def f16(k):
                    return jnp.broadcast_to(
                        rowI[PBOX0 + k * 16:PBOX0 + (k + 1) * 16],
                        (ARITY, 128))
                lox, loy, loz = f16(0), f16(1), f16(2)
                hix, hiy, hiz = f16(3), f16(4), f16(5)
                t0x = (lox - ox) * ivx; t1x = (hix - ox) * ivx
                t0y = (loy - oy) * ivy; t1y = (hiy - oy) * ivy
                t0z = (loz - oz) * ivz; t1z = (hiz - oz) * ivz
                tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                               jnp.minimum(t0y, t1y)),
                                   jnp.minimum(t0z, t1z))
                tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                               jnp.maximum(t0y, t1y)),
                                   jnp.maximum(t0z, t1z))
                chit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < t_scan)
                vis = jnp.bitwise_and(jnp.right_shift(
                    jnp.full((ARITY, 128), 1, jnp.int32) * curmask,
                    jnp.broadcast_to(iota16, (ARITY, 128))), 1)
                chit = chit & (vis == 0)
                if variant == 'nodec':
                    t_s[p:p + 1, :] = jnp.where(
                        jnp.any(chit, axis=0, keepdims=True),
                        t_s[p:p + 1, :], t_s[p:p + 1, :])
                    return
                tsel = jnp.where(chit, tmin, BIG)
                pc_min = jnp.min(tsel, axis=1, keepdims=True)
                anyc = jnp.any(chit, axis=1, keepdims=True)
                key = jnp.where(anyc, pc_min, BIG)
                kmin = jnp.min(key, axis=0, keepdims=True)
                iota_sel = jnp.where((key == kmin) & anyc, iota16, ARITY)
                selc = jnp.min(iota_sel)
                sel_onehot = (iota_sel == jnp.broadcast_to(
                    jnp.full((1, 1), 1, jnp.int32) * selc, (ARITY, 1))) & anyc
                refs = jax.lax.bitcast_convert_type(
                    rowI[PREFS:PREFS + ARITY], jnp.int32)
                if variant == 'packed':
                    # selref in [-Nl, Ni], |ref| < 2^24; pack as
                    # (selref+2^24)<<6 | selc<<2 | (nhits>1)<<1 | (nhits>0)
                    nh = jnp.sum(anyc.astype(jnp.int32))
                    word = (((jnp.sum(jnp.where(sel_onehot, refs, 0))
                              + (1 << 24)) << 6)
                            | (selc << 2)
                            | (jnp.where(nh > 1, 2, 0))
                            | (jnp.where(nh > 0, 1, 0)))
                    dec_s[p, 0] = word
                else:
                    dec_s[p, 0] = jnp.sum(jnp.where(sel_onehot, refs, 0))
                    dec_s[p, 1] = jnp.sum(jnp.where(sel_onehot, bits16, 0))
                    dec_s[p, 2] = jnp.sum(anyc.astype(jnp.int32))

        def scalar_phase(p, cur, curmask, sp):
            is_leaf = cur < 0
            alive = cur != DONE
            if variant == 'script':
                # scripted walk: ping through the inner table then stop
                nxt = jnp.where(alive & (cur < 2000), cur + 1, DONE)
                return nxt.astype(jnp.int32), curmask, sp
            if variant == 'nodec':
                nxt = jnp.where(alive & ~is_leaf & (cur < 2000), cur + 1,
                                jnp.where(alive, DONE, DONE))
                return nxt.astype(jnp.int32), curmask, sp
            if variant == 'packed':
                word = dec_s[p, 0]
                selref = (word >> 6) - (1 << 24)
                selbit = 1 << ((word >> 2) & 15)
                nhits1 = word & 1
                nhits2 = (word >> 1) & 1
                descend = alive & ~is_leaf & (nhits1 > 0)
                do_push = descend & (nhits2 > 0) & (sp < d)
            else:
                selref, selbit, nhits = dec_s[p, 0], dec_s[p, 1], dec_s[p, 2]
                descend = alive & ~is_leaf & (nhits > 0)
                do_push = descend & (nhits > 1) & (sp < d)

            @pl.when(do_push)
            def _():
                stk_n[p, sp] = cur
                stk_m[p, sp] = curmask | selbit
            sp2 = jnp.where(do_push, sp + 1, sp)
            can_pop = alive & ~descend & (sp2 > 0)
            spr = jnp.where(can_pop, sp2 - 1, sp2)
            pn = stk_n[p, spr]
            pm = stk_m[p, spr]
            nxt = jnp.where(descend, selref, jnp.where(can_pop, pn, DONE))
            nmask = jnp.where(descend, 0, jnp.where(can_pop, pm, 0))
            nsp = jnp.where(can_pop, spr, sp2)
            return (nxt.astype(jnp.int32), nmask.astype(jnp.int32),
                    nsp.astype(jnp.int32))

        def cond(carry):
            curs = carry[0]
            aliv = curs[0] != DONE
            for p in range(1, NPK):
                aliv = aliv | (curs[p] != DONE)
            return aliv

        def body(carry):
            curs, masks, sps = carry
            if variant == 'phase':
                for p in range(NPK):
                    vector_phase(p, curs[p], masks[p], sps[p])
                out = [scalar_phase(p, curs[p], masks[p], sps[p])
                       for p in range(NPK)]
            else:
                out = []
                for p in range(NPK):
                    vector_phase(p, curs[p], masks[p], sps[p])
                    out.append(scalar_phase(p, curs[p], masks[p], sps[p]))
            return (tuple(r[0] for r in out), tuple(r[1] for r in out),
                    tuple(r[2] for r in out))

        for p in range(NPK):
            b = p * RAY_ROWS
            t_s[p:p + 1, :] = rays[b + 9:b + 10]
        gid_s[:, :] = jnp.full((NPK, PACKET), -1, jnp.int32)
        fnd_s[:, :] = jnp.zeros((NPK, PACKET), jnp.int32)
        starts = []
        for p in range(NPK):
            b = p * RAY_ROWS
            stk_n[p, 0] = 0
            stk_m[p, 0] = 0
            any_live = jnp.sum((rays[b + 10:b + 11] != 0.0).astype(jnp.int32))
            starts.append(jnp.where(any_live > 0, jnp.int32(0), DONE))
        init = (tuple(starts),
                tuple(jnp.int32(0) for _ in range(NPK)),
                tuple(jnp.int32(0) for _ in range(NPK)))
        jax.lax.while_loop(cond, body, init)
        for p in range(NPK):
            t_out[4 * p + 0:4 * p + 1, :] = t_s[p:p + 1, :]
            t_out[4 * p + 1:4 * p + 2, :] = jax.lax.bitcast_convert_type(
                gid_s[p:p + 1, :], jnp.float32)
            t_out[4 * p + 2:4 * p + 3, :] = fnd_s[p:p + 1, :].astype(
                jnp.float32)
            t_out[4 * p + 3:4 * p + 4, :] = jnp.zeros((1, PACKET), jnp.float32)
    return kernel


def run_variant(variant, itab, ltab, rays, depth):
    gn = rays.shape[0] // (NPK * RAY_ROWS)
    d = depth + 2
    rayspec = pl.BlockSpec((NPK * RAY_ROWS, PACKET), lambda g: (g, 0),
                           memory_space=pltpu.VMEM)
    outspec = pl.BlockSpec((NPK * 4, PACKET), lambda g: (g, 0),
                           memory_space=pltpu.VMEM)
    tabspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((gn * NPK * 4, PACKET), jnp.float32)
    return pl.pallas_call(
        variant_kernel(variant, d),
        grid=(gn,),
        out_shape=out_shape,
        in_specs=[tabspec, tabspec, rayspec],
        out_specs=outspec,
        scratch_shapes=[pltpu.SMEM((NPK, d + 1), jnp.int32),
                        pltpu.SMEM((NPK, d + 1), jnp.int32),
                        pltpu.VMEM((NPK, PACKET), jnp.float32),
                        pltpu.VMEM((NPK, PACKET), jnp.int32),
                        pltpu.VMEM((NPK, PACKET), jnp.int32),
                        pltpu.SMEM((NPK, 4), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(itab, ltab, rays)


def main():
    scene = get_scene('sibenik', asset_dirs=['/root/reference', '.'])
    dyn = scene.dynamic_arrays()
    cam = cam_mod.Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
    W, H = 1920, 192
    ys, xs = np.mgrid[0:H, 0:W]
    B = W * H
    ro, rd = cam_mod.generate_rays_simple(
        cam, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()), W, 1080)
    tables = tpk.split_packet_tables(np.asarray(dyn.wide_rows),
                                     scene.wide_depth)
    TH, TW = 8, 16
    perm = jnp.asarray(np.arange(B).reshape(H // TH, TH, W // TW, TW)
                       .transpose(0, 2, 1, 3).reshape(-1))

    def ray_blocks(ro_, rd_):
        inv = isect.safe_inv_dir(rd_)
        t0 = jnp.full((B,), 3.0e38 / 2, jnp.float32)
        M = jnp.concatenate([
            ro_, rd_, inv, t0[:, None],
            jnp.ones((B, 1), jnp.float32),
            jnp.zeros((B, 1), jnp.float32),
            ro_ * inv, jnp.zeros((B, 1), jnp.float32)], axis=1)
        rays = jnp.swapaxes(M.reshape(-1, PACKET, RAY_ROWS), -1, -2)
        return rays.reshape(-1, PACKET)

    prim = ray_blocks(ro[perm], rd[perm])

    # bounce wavefront: hemisphere dirs from primary hits, morton+oct sorted
    from cuda_pathtracer_tpu.ops.dispatch import trace
    h = tpk.traverse_packet(scene.to_device(), tables, ro, rd)
    hitn = np.asarray(h.t)
    ron, rdn = np.asarray(ro), np.asarray(rd)
    hp = (ron + rdn * (np.minimum(hitn, 100.0)[:, None] - 1e-3)).astype(
        np.float32)
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
    bounce = ray_blocks(jnp.asarray(hp[om]), jnp.asarray(d2[om]))

    variants = (sys.argv[1:] if len(sys.argv) > 1
                else ['v0', 'script', 'nodec', 'packed', 'phase'])
    ref_out = {}
    for name, rays in [('prim', prim), ('bounce', bounce)]:
        print(f'--- {name} wavefront ({B} rays)')
        for v in variants:
            f = jax.jit(lambda r, v=v: run_variant(
                v, tables.inner, tables.leaf, r, tables.depth))
            out = f(rays)
            _ = np.asarray(out[:1])
            K = 4 if name == 'prim' else 2
            t0 = time.perf_counter()
            outs = [f(rays) for _ in range(K)]
            _ = np.asarray(outs[-1][:1])
            for o in outs:
                o.block_until_ready()
            dt = (time.perf_counter() - t0) / K
            note = ''
            if v in ('v0', 'packed', 'phase'):
                key = (name, 't')
                tv = np.asarray(out).reshape(-1, 4, PACKET)[:, 0].ravel()
                if key not in ref_out:
                    ref_out[key] = tv
                else:
                    note = ('  [MATCH]' if np.array_equal(ref_out[key], tv)
                            else '  [MISMATCH!]')
            print(f'{v:8s}: {dt*1e3:8.2f} ms  {B/dt/1e6:7.2f} Mrays/s{note}')


if __name__ == '__main__':
    main()
