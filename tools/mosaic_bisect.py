"""Micro-bisect of the remote-Mosaic compile crash hit by subpacket_probe.

Each variant adds ONE construct over the last, starting from a kernel the
compiler demonstrably accepts. Run them in order; the first FAIL names the
guilty construct.

  m0  fori_loop(STEPS) with scalar carry, static row read, VPU sum -> out
  m1  + dynamic row read tab[pl.ds(cur,1)] with cur = loop carry
  m2  + jnp.transpose of the fetched row + broadcast expand + slab-ish math
  m3  + full-reduce write into SMEM, same-step scalar readback as next cur
      (the shipping v2 kernel's exact decision pattern, while_loop though)
  m4  m3 but with fori_loop instead of while_loop
  m5  m4 + 8 run_set unrolls (SETS=8)
  m6  m4 + SMEM-resident ids (no carry): write sc[2,g] one step, read next

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/mosaic_bisect.py [variants...]
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

N = 1 << 12
STEPS = int(os.environ.get('BISECT_STEPS', '1024'))
PMETA = 96


def _body_math(rowT):
    def f16(k):
        return jnp.broadcast_to(rowT[k * 16:(k + 1) * 16], (16, 128))
    a = jnp.minimum(f16(0) * 1.5 - 0.25, f16(1))
    b = jnp.maximum(f16(2) * 0.5 + 0.125, f16(3))
    return jnp.maximum(a, b)


def mk(variant):
    def kernel(tab_ref, out_ref, sc, t_s):
        sets = 8 if variant == 'm5' else 1

        def dec_from(x):
            anyc = jnp.any(x > 0.7, axis=1, keepdims=True)     # (16,1)
            bits = (1 << jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0))
            return jnp.sum(jnp.where(anyc, bits, 0))

        def run_set(c):
            if variant == 'm0':
                def step(s, cur):
                    row = tab_ref[0:1, :]
                    v = jnp.sum(row).astype(jnp.int32)
                    return (cur * 5 + s + v - v) & (N - 1)
                fin = jax.lax.fori_loop(0, STEPS, step, jnp.int32(c))
            elif variant == 'm1':
                def step(s, cur):
                    row = tab_ref[pl.ds(cur, 1), :]
                    v = jnp.max(row)
                    probe = jnp.where(v > 2.0, 1, 0).astype(jnp.int32)
                    return (cur * 5 + s + probe) & (N - 1)
                fin = jax.lax.fori_loop(0, STEPS, step, jnp.int32(c))
            elif variant == 'm2':
                def step(s, cur):
                    rowT = jnp.transpose(tab_ref[pl.ds(cur, 1), :])
                    m = _body_math(rowT)
                    probe = jnp.where(jnp.max(m) > 2.0, 1, 0
                                      ).astype(jnp.int32)
                    return (cur * 5 + s + probe) & (N - 1)
                fin = jax.lax.fori_loop(0, STEPS, step, jnp.int32(c))
            elif variant == 'm3':
                def cond(carry):
                    return carry[1] < STEPS

                def body(carry):
                    cur, s = carry
                    rowT = jnp.transpose(tab_ref[pl.ds(cur, 1), :])
                    m = _body_math(rowT)
                    sc[0, 0] = dec_from(m)
                    nxt = (sc[0, 0] + cur * 5 + s) & (N - 1)
                    return (nxt.astype(jnp.int32), s + 1)
                fin = jax.lax.while_loop(
                    cond, body, (jnp.int32(c), jnp.int32(0)))[0]
            elif variant in ('m4', 'm5'):
                def step(s, cur):
                    rowT = jnp.transpose(tab_ref[pl.ds(cur, 1), :])
                    m = _body_math(rowT)
                    sc[0, 0] = dec_from(m)
                    return ((sc[0, 0] + cur * 5 + s) & (N - 1)
                            ).astype(jnp.int32)
                fin = jax.lax.fori_loop(0, STEPS, step, jnp.int32(c))
            else:  # m6
                def step(s, _):
                    rowT = jnp.transpose(tab_ref[pl.ds(sc[2, 0], 1), :])
                    m = _body_math(rowT)
                    sc[0, 0] = dec_from(m)
                    sc[2, 0] = (sc[0, 0] + sc[2, 0] * 5 + s) & (N - 1)
                    return 0
                sc[2, 0] = c
                jax.lax.fori_loop(0, STEPS, step, 0)
                fin = sc[2, 0]
            out_ref[0:1, :] = (jnp.zeros((1, 128), jnp.float32)
                               + fin.astype(jnp.float32))

        for c in range(sets):
            run_set(c)
    return kernel


def mk_rays(variant):
    """m7: m6 + rays input sliced into the math.  m8: + bitcast meta word.
    m9: + t_s slab compare and out accumulation (full probe-v2ref shape)."""
    def kernel(tab_ref, rays_ref, out_ref, sc, t_s):
        rays = rays_ref[:]
        iota16 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
        bits16 = (1 << iota16)
        iota128 = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        ivx, ivy = rays[6:7], rays[7:8]
        oivx, oivy = rays[12:13], rays[13:14]

        def step(s, _):
            rowT = jnp.transpose(tab_ref[pl.ds(sc[2, 0], 1), :])

            def f16(k):
                return jnp.broadcast_to(rowT[k * 16:(k + 1) * 16], (16, 128))
            t0x = f16(0) * ivx - oivx
            t1x = f16(1) * ivx - oivx
            t0y = f16(2) * ivy - oivy
            t1y = f16(3) * ivy - oivy
            tmin = jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y))
            tmax = jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y))
            if variant == 'm9':
                chit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < t_s[0:1, :])
            else:
                chit = tmax >= jnp.maximum(tmin, 0.0)
            anyc = jnp.any(chit, axis=1, keepdims=True)
            sc[0, 0] = jnp.sum(jnp.where(anyc, bits16, 0))
            if variant in ('m8', 'm9'):
                rowTi = jax.lax.bitcast_convert_type(rowT, jnp.int32)
                sc[1, 0] = jnp.sum(jnp.where(iota128 == PMETA, rowTi, 0))
            else:
                sc[1, 0] = 0
            sc[2, 0] = (sc[0, 0] + sc[1, 0] + sc[2, 0] * 5 + s) & (N - 1)
            return 0

        def run_set(c):
            t_s[0:1, :] = rays[9:10]
            sc[2, 0] = c % N
            jax.lax.fori_loop(0, STEPS, step, 0)
            out_ref[0:1, :] = (jnp.zeros((1, 128), jnp.float32)
                               + sc[2, 0].astype(jnp.float32)
                               + (t_s[0:1, :] if variant == 'm9' else 0.0))

        run_set(0)
    return kernel


def run(variant):
    tab = jnp.asarray(np.random.default_rng(0).random((N, 128), np.float32))
    rays = jnp.asarray(
        np.random.default_rng(1).random((16, 128), np.float32) + 0.5)
    with_rays = variant in ('m7', 'm8', 'm9')
    f = pl.pallas_call(
        mk_rays(variant) if with_rays else mk(variant),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (
            2 if with_rays else 1),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((3, 8), jnp.int32),
                        pltpu.VMEM((1, 128), jnp.float32)],
    )
    g = jax.jit(lambda *a: f(*a))
    t0 = time.perf_counter()
    out = g(tab, rays) if with_rays else g(tab)
    out.block_until_ready()
    _ = np.asarray(out)
    print(f'{variant}: OK compile+run {time.perf_counter()-t0:.1f}s '
          f'out={float(out[0,0]):.0f}', flush=True)


if __name__ == '__main__':
    for v in (sys.argv[1:] or ['m0', 'm1', 'm2', 'm3', 'm4', 'm5', 'm6',
                               'm7', 'm8', 'm9']):
        try:
            run(v)
        except Exception as e:
            print(f'{v}: FAILED {type(e).__name__}: {str(e)[:200]}',
                  flush=True)
