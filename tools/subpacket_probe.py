"""Shared-step subpacket traversal probe (v3 design study), take 2.

The v2 multi-push kernel (ops/traverse_packet2.py) costs ~390 ns per node
visit on sorted bounce wavefronts and tests 128 rays x 16 boxes per visit.
Width-16 subpackets RAISE total visits 2.0x (tools/packet_width_analysis.py)
but cut tested pairs to 2.0 * 16/128 = 0.25x — IF one step can serve 8
subpacket visits with shared vector work. Break-even: a v3 step pays iff
step_cost(v3) < 4x step_cost(v2) (8 visits/step / 2x visit inflation).

Take-1 lessons (all variants crashed the remote Mosaic compile): vector-
reduced scalars were consumed directly as dynamic-slice indices and the
(128,8) transposed scratch needed column stores. This version only uses
constructs the shipping v2 kernel already lowers: row stores into an
(8,128) scratch, register transposes of (1,128) rows, full-reduce writes
into SMEM, scalar readback from SMEM for all dynamic indices, and the MXU
doing the transpose via dot_general on the untransposed rows.

Variants (incremental, bisect order):
  v2ref    working-kernel step: 1 row / 128-lane packet, broadcast expands,
           one any() reduce, SMEM round-trip, data-dependent next id
  fetch8   8 scripted row stores into rt(8,128); 1 SMEM probe word;
           8 next ids derived on the scalar core
  exp_mxu  + 6 box-field expands as dot_general((8,16)^T @ (8,128)) MXU
           matmuls + shared slab; decision = ONE any() reduce (shared)
  dec_mxu  + per-group decisions with NO cross-lane VPU reduce: counts
           matmul (16,8), bits matmul (8,1), meta col, packed into an
           (8,DECW) VMEM block, DMA'd to SMEM, 8 scalar readbacks each
           feeding that group's next id                      [v3 design]
  dec_sum  exp_mxu + 16 full-reduce SMEM writes (v1-style wall) instead
           of the DMA handoff, for comparison
  full     dec_mxu + unconditional leaf path (9 tri expands + MT + best-t
           update)                                           [upper bound]

ns/step is reported after subtracting the ~30 ms tunnel RTT floor
(memory: tpu-tunnel-measurement-traps).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/subpacket_probe.py [variants...]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from jax.experimental import pallas as pl           # noqa: E402
from jax.experimental.pallas import tpu as pltpu    # noqa: E402

sys.path.insert(0, os.path.dirname(__file__) + '/..')

ARITY, LEAF_MAX = 16, 12
PTRIS, PGIDS, PMETA = 0, 108, 96
PBOX0 = 0
NGROUP = 8
GW = 128 // NGROUP
NLOG2 = 15
N = 1 << NLOG2
STEPS = int(os.environ.get('PROBE_STEPS', '32768'))
SETS = int(os.environ.get('PROBE_SETS', '8'))
DECW = int(os.environ.get('PROBE_DECW', '128'))
RTT = float(os.environ.get('PROBE_RTT_MS', '30')) * 1e-3
BIG = 1e30
MT_DET_EPS = 1e-4


def _mk(variant: str):
    do_expand = variant in ('exp_mxu', 'dec_mxu', 'dec_sum', 'full')
    dec_mxu = variant in ('dec_mxu', 'full')
    dec_sum = variant == 'dec_sum'
    do_leaf = variant == 'full'

    def kernel(tab_ref, rays_ref, out_ref, *scratch):
        if dec_mxu:
            rt, dec_v, dmem, sc, t_s, sem = scratch
        else:
            rt, sc, t_s = scratch
        rays = rays_ref[:]
        iota16 = jax.lax.broadcasted_iota(jnp.int32, (ARITY, 1), 0)
        bits16 = (1 << iota16)
        bits16f = bits16.astype(jnp.float32)   # 2^i (f32 iota doesn't lower)
        lane8w = jax.lax.broadcasted_iota(jnp.int32, (8, DECW), 1)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        # gmapT[g, l] = 1 if lane l belongs to group g
        gmapT = (jax.lax.broadcasted_iota(jnp.int32, (NGROUP, 128), 1) // GW
                 == jax.lax.broadcasted_iota(jnp.int32, (NGROUP, 128), 0)
                 ).astype(jnp.float32)
        # gmap[l, g] = same, lane-major (for the counts matmul)
        gmap = (jax.lax.broadcasted_iota(jnp.int32, (128, NGROUP), 0) // GW
                == jax.lax.broadcasted_iota(jnp.int32, (128, NGROUP), 1)
                ).astype(jnp.float32)

        ox, oy, oz = rays[0:1], rays[1:2], rays[2:3]
        dx, dy, dz = rays[3:4], rays[4:5], rays[5:6]
        ivx, ivy, ivz = rays[6:7], rays[7:8], rays[8:9]
        oivx, oivy, oivz = rays[12:13], rays[13:14], rays[14:15]

        def expand(off, k, rows=ARITY):
            # out[i, l] = rt[group(l), off + k*rows + i]: the MXU does the
            # transpose — contract rt's group dim with gmapT's group dim
            sl = rt[:, off + k * rows:off + (k + 1) * rows]   # (8, rows)
            return jax.lax.dot_general(
                sl, gmapT, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (rows, 128)

        def slab(lox, loy, loz, hix, hiy, hiz):
            t0x = lox * ivx - oivx; t1x = hix * ivx - oivx
            t0y = loy * ivy - oivy; t1y = hiy * ivy - oivy
            t0z = loz * ivz - oivz; t1z = hiz * ivz - oivz
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                           jnp.minimum(t0y, t1y)),
                               jnp.minimum(t0z, t1z))
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                           jnp.maximum(t0y, t1y)),
                               jnp.maximum(t0z, t1z))
            return tmin, tmax

        def step(s, _):
            # 8 data-dependent row fetches (ids from SMEM, scalar core)
            for g in range(NGROUP):
                rt[g:g + 1, :] = tab_ref[pl.ds(sc[2, g], 1), :]

            if do_expand:
                lox, loy, loz = expand(PBOX0, 0), expand(PBOX0, 1), \
                    expand(PBOX0, 2)
                hix, hiy, hiz = expand(PBOX0, 3), expand(PBOX0, 4), \
                    expand(PBOX0, 5)
                tmin, tmax = slab(lox, loy, loz, hix, hiy, hiz)
                chit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < t_s[0:1, :])

                if dec_mxu:
                    # per-(slot, group) hit counts — MXU, no VPU reduce
                    counts = jax.lax.dot_general(
                        chit.astype(jnp.float32), gmap,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)    # (16, 8)
                    c01 = (counts > 0.0).astype(jnp.float32)
                    bitsT = jax.lax.dot_general(
                        c01, bits16f, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)    # (8, 1)
                    rti = jax.lax.bitcast_convert_type(rt[:, :], jnp.int32)
                    metaT = jnp.sum(jnp.where(lane8 == PMETA, rti, 0),
                                    axis=1, keepdims=True)     # (8, 1)
                    dec_v[:, :] = jnp.where(
                        lane8w == 0, bitsT.astype(jnp.int32),
                        jnp.where(lane8w == 1, metaT, 0))
                    cp = pltpu.make_async_copy(dec_v, dmem, sem)
                    cp.start()
                    cp.wait()
                    for g in range(NGROUP):
                        sc[2, g] = ((dmem[g, 0] + dmem[g, 1]
                                     + sc[2, g] * 5 + g * 37 + s)
                                    & (N - 1))
                elif dec_sum:
                    rti = jax.lax.bitcast_convert_type(rt[:, :], jnp.int32)
                    glane16 = (jax.lax.broadcasted_iota(
                        jnp.int32, (ARITY, 128), 1) // GW)
                    for g in range(NGROUP):
                        anyg = jnp.any(chit & (glane16 == g), axis=1,
                                       keepdims=True)          # (16, 1)
                        sc[0, g] = jnp.sum(jnp.where(anyg, bits16, 0))
                        sc[1, g] = jnp.sum(
                            jnp.where((sub8 == g) & (lane8 == PMETA),
                                      rti, 0))
                    for g in range(NGROUP):
                        sc[2, g] = ((sc[0, g] + sc[1, g]
                                     + sc[2, g] * 5 + g * 37 + s)
                                    & (N - 1))
                else:
                    anyc = jnp.any(chit, axis=1, keepdims=True)  # (16, 1)
                    sc[0, 0] = jnp.sum(jnp.where(anyc, bits16, 0))
                    for g in range(NGROUP):
                        sc[2, g] = ((sc[0, 0] + sc[2, g] * 5
                                     + g * 37 + s) & (N - 1))

                if do_leaf:
                    tri = lambda k: expand(PTRIS, k, LEAF_MAX)  # noqa: E731
                    v0x, v0y, v0z = tri(0), tri(1), tri(2)
                    e1x, e1y, e1z = tri(3), tri(4), tri(5)
                    e2x, e2y, e2z = tri(6), tri(7), tri(8)
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
                    okm = ((jnp.abs(a) >= MT_DET_EPS) & (u >= 0.0)
                           & (u <= 1.0) & (vv >= 0.0) & (u + vv <= 1.0)
                           & (tt > 0.0) & (tt < t_s[0:1, :]))
                    ttm = jnp.where(okm, tt, BIG)
                    leaf_t = jnp.min(ttm, axis=0, keepdims=True)
                    take = jnp.any(okm, axis=0, keepdims=True)
                    t_s[0:1, :] = jnp.where(take, leaf_t, t_s[0:1, :])
            else:
                # fetch8: one cheap probe word keeps the fetch->index->fetch
                # dependence real without expand work
                sc[0, 0] = jnp.sum(rt[0:1, 0:1]).astype(jnp.int32)
                for g in range(NGROUP):
                    sc[2, g] = ((sc[0, 0] + sc[2, g] * 5
                                 + g * 37 + s) & (N - 1))
            return 0

        def run_set(c):
            t_s[0:1, :] = rays[9:10]
            for g in range(NGROUP):
                sc[2, g] = (c * 7 + g * 13) % N
            jax.lax.fori_loop(0, STEPS, step, 0)
            acc = sc[2, 0]
            for g in range(1, NGROUP):
                acc = acc + sc[2, g]
            out_ref[0:1, :] = (jnp.zeros((1, 128), jnp.float32)
                               + acc.astype(jnp.float32) + t_s[0:1, :])

        for c in range(SETS):
            run_set(c)
    return kernel


def _mk_v2ref():
    def kernel(tab_ref, rays_ref, out_ref, sc, t_s):
        rays = rays_ref[:]
        iota16 = jax.lax.broadcasted_iota(jnp.int32, (ARITY, 1), 0)
        bits16 = (1 << iota16)
        iota128 = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        ivx, ivy, ivz = rays[6:7], rays[7:8], rays[8:9]
        oivx, oivy, oivz = rays[12:13], rays[13:14], rays[14:15]

        def step(s, _):
            rowT = jnp.transpose(tab_ref[pl.ds(sc[2, 0], 1), :])

            def f16(k):
                return jnp.broadcast_to(
                    rowT[PBOX0 + k * 16:PBOX0 + (k + 1) * 16], (ARITY, 128))
            lox, loy, loz = f16(0), f16(1), f16(2)
            hix, hiy, hiz = f16(3), f16(4), f16(5)
            t0x = lox * ivx - oivx; t1x = hix * ivx - oivx
            t0y = loy * ivy - oivy; t1y = hiy * ivy - oivy
            t0z = loz * ivz - oivz; t1z = hiz * ivz - oivz
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                           jnp.minimum(t0y, t1y)),
                               jnp.minimum(t0z, t1z))
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                           jnp.maximum(t0y, t1y)),
                               jnp.maximum(t0z, t1z))
            chit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < t_s[0:1, :])
            anyc = jnp.any(chit, axis=1, keepdims=True)
            sc[0, 0] = jnp.sum(jnp.where(anyc, bits16, 0))
            rowTi = jax.lax.bitcast_convert_type(rowT, jnp.int32)
            sc[1, 0] = jnp.sum(jnp.where(iota128 == PMETA, rowTi, 0))
            sc[2, 0] = ((sc[0, 0] + sc[1, 0] + sc[2, 0] * 5 + s)
                        & (N - 1))
            return 0

        def run_set(c):
            t_s[0:1, :] = rays[9:10]
            sc[2, 0] = c % N
            jax.lax.fori_loop(0, STEPS, step, 0)
            out_ref[0:1, :] = (jnp.zeros((1, 128), jnp.float32)
                               + sc[2, 0].astype(jnp.float32)
                               + t_s[0:1, :])

        for c in range(SETS):
            run_set(c)
    return kernel


def run(variant):
    tab = jnp.asarray(
        np.random.default_rng(0).random((N, 128), np.float32))
    rays = jnp.asarray(
        np.random.default_rng(1).random((16, 128), np.float32) + 0.5)
    kern = _mk_v2ref() if variant == 'v2ref' else _mk(variant)
    if variant == 'v2ref':
        scratch = [pltpu.SMEM((3, NGROUP), jnp.int32),
                   pltpu.VMEM((1, 128), jnp.float32)]
    elif variant in ('dec_mxu', 'full'):
        scratch = [pltpu.VMEM((NGROUP, 128), jnp.float32),
                   pltpu.VMEM((NGROUP, DECW), jnp.int32),
                   pltpu.SMEM((NGROUP, DECW), jnp.int32),
                   pltpu.SMEM((3, NGROUP), jnp.int32),
                   pltpu.VMEM((1, 128), jnp.float32),
                   pltpu.SemaphoreType.DMA]
    else:
        scratch = [pltpu.VMEM((NGROUP, 128), jnp.float32),
                   pltpu.SMEM((3, NGROUP), jnp.int32),
                   pltpu.VMEM((1, 128), jnp.float32)]
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )
    g = jax.jit(lambda t, r: f(t, r))
    out = g(tab, rays)
    out.block_until_ready()
    _ = np.asarray(out)
    t0 = time.perf_counter()
    out = g(tab, rays)
    out.block_until_ready()
    _ = np.asarray(out)
    dt = time.perf_counter() - t0
    nstep = STEPS * SETS
    dev = max(dt - RTT, 1e-9)
    print(f'{variant:8s}: {dt*1e3:8.2f} ms wall  '
          f'{dev/nstep*1e9:8.1f} ns/step dev ({nstep} steps)', flush=True)
    return dev / nstep


if __name__ == '__main__':
    variants = sys.argv[1:] or ['v2ref', 'fetch8', 'exp_mxu', 'dec_mxu',
                                'dec_sum', 'full']
    res = {}
    for v in variants:
        try:
            res[v] = run(v)
        except Exception as e:
            print(f'{v:8s}: FAILED {type(e).__name__}: {str(e)[:300]}',
                  flush=True)
    if 'v2ref' in res and 'full' in res:
        print(f'\nv3 full / v2 step = {res["full"]/res["v2ref"]:.2f} '
              f'(break-even 4.0, win below)')
