"""Kernel lab 2: fixed-step-count bisect of the per-decision cost.

Every variant runs T steps per packet with the SAME vector volume (row fetch
+ transpose + 16-slab test + reductions); they differ only in how the next
node index is produced:
  sA  scripted: next = f(step) pure scalar carry arithmetic
  sB  dec-dependent: next depends on the SMEM dec word written by the vector
      phase (real vector->scalar round trip on the critical path)
  sC  sB + stack traffic: pl.when push/pop of SMEM stack entries
  sD  sB but decision DELAYED one step (reads the PREVIOUS step's dec):
      breaks the round-trip dependency - measures how much latency (vs
      throughput) the sync costs
Run: PYTHONPATH=... JAX_PLATFORMS=axon python tools/kernel_lab2.py
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

ARITY = 16
N = 8192          # inner table rows
T = 256           # steps per packet
NPK = 2
BIG = 3.0e38


def make_kernel(variant):
    def kernel(itab_ref, rays_ref, out_ref, dec_s, t_s):
        iota16 = jax.lax.broadcasted_iota(jnp.int32, (ARITY, 1), 0)
        rays = rays_ref[:]

        def vector_phase(p, cur):
            b = p * 12
            ox, oy, oz = rays[b + 0:b + 1], rays[b + 1:b + 2], rays[b + 2:b + 3]
            ivx, ivy, ivz = (rays[b + 6:b + 7], rays[b + 7:b + 8],
                             rays[b + 8:b + 9])
            rowI = jnp.transpose(itab_ref[pl.ds(cur, 1), :])

            def f16(k):
                return jnp.broadcast_to(
                    rowI[k * 16:(k + 1) * 16], (ARITY, 128))
            lox, loy, loz = f16(0), f16(1), f16(2)
            hix, hiy, hiz = f16(3), f16(4), f16(5)
            t = t_s[p:p + 1, :]
            t0x = (lox - ox) * ivx; t1x = (hix - ox) * ivx
            t0y = (loy - oy) * ivy; t1y = (hiy - oy) * ivy
            t0z = (loz - oz) * ivz; t1z = (hiz - oz) * ivz
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                           jnp.minimum(t0y, t1y)),
                               jnp.minimum(t0z, t1z))
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                           jnp.maximum(t0y, t1y)),
                               jnp.maximum(t0z, t1z))
            chit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < t)
            tsel = jnp.where(chit, tmin, BIG)
            pc_min = jnp.min(tsel, axis=1, keepdims=True)
            anyc = jnp.any(chit, axis=1, keepdims=True)
            key = jnp.where(anyc, pc_min, BIG)
            kmin = jnp.min(key, axis=0, keepdims=True)
            iota_sel = jnp.where((key == kmin) & anyc, iota16, ARITY)
            selc = jnp.min(iota_sel)
            t_s[p:p + 1, :] = jnp.where(
                jnp.broadcast_to(kmin, (1, 128)) < BIG, t * 1.0000001, t)
            dec_s[p, 0] = selc

        def body(carry):
            curs, steps, spv = carry
            for p in range(NPK):
                vector_phase(p, curs[p])
            new = []
            nsp = []
            for p in range(NPK):
                step = steps[p]
                if variant == 'sA':
                    nxt = (curs[p] * 5 + 1) % (N - 1)
                elif variant in ('sB', 'sC'):
                    d0 = dec_s[p, 0]
                    nxt = (curs[p] + d0 + 1) % (N - 1)
                else:  # sD: use previous step's dec (carried)
                    nxt = (curs[p] + spv[p] + 1) % (N - 1)
                if variant == 'sC':
                    @pl.when(step % 2 == 0)
                    def _(p=p, step=step, nxt=nxt):
                        dec_s[p, 1] = nxt

                    @pl.when(step % 2 == 1)
                    def _(p=p, step=step):
                        dec_s[p, 2] = dec_s[p, 1]
                nxt = jnp.where(step + 1 >= T, -1, nxt)
                new.append(nxt.astype(jnp.int32))
                if variant == 'sD':
                    nsp.append(dec_s[p, 0])
                else:
                    nsp.append(jnp.int32(0))
            return (tuple(new), tuple(s + 1 for s in steps), tuple(nsp))

        def cond(carry):
            a = carry[0][0] >= 0
            for p in range(1, NPK):
                a = a | (carry[p if False else 0][p] >= 0) if False else a
            for p in range(1, NPK):
                a = a | (carry[0][p] >= 0)
            return a

        for p in range(NPK):
            t_s[p:p + 1, :] = jnp.full((1, 128), BIG / 2, jnp.float32)
            dec_s[p, 0] = 0
        init = (tuple(jnp.int32(p) for p in range(NPK)),
                tuple(jnp.int32(0) for _ in range(NPK)),
                tuple(jnp.int32(0) for _ in range(NPK)))
        jax.lax.while_loop(cond, body, init)
        for p in range(NPK):
            out_ref[p:p + 1, :] = t_s[p:p + 1, :]
        for p in range(NPK, 8):
            out_ref[p:p + 1, :] = jnp.zeros((1, 128), jnp.float32)
    return kernel


def run(variant, G=256):
    itab = jnp.asarray(np.random.default_rng(0)
                       .uniform(-10, 10, (N, 128)).astype(np.float32))
    rays = jnp.asarray(np.random.default_rng(1)
                       .uniform(0.1, 1, (G * NPK * 12, 128))
                       .astype(np.float32))
    rayspec = pl.BlockSpec((NPK * 12, 128), lambda g: (g, 0),
                           memory_space=pltpu.VMEM)
    outspec = pl.BlockSpec((8, 128), lambda g: (g, 0),
                           memory_space=pltpu.VMEM)
    f = jax.jit(lambda it, r: pl.pallas_call(
        make_kernel(variant),
        grid=(G,),
        out_shape=jax.ShapeDtypeStruct((G * 8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), rayspec],
        out_specs=outspec,
        scratch_shapes=[pltpu.SMEM((NPK, 4), jnp.int32),
                        pltpu.VMEM((NPK, 128), jnp.float32)],
    )(it, r))
    out = f(itab, rays)
    _ = np.asarray(out[:1])
    t0 = time.perf_counter()
    K = 8
    outs = [f(itab, rays) for _ in range(K)]
    _ = np.asarray(outs[-1][:1])
    for o in outs:
        o.block_until_ready()
    dt = (time.perf_counter() - t0) / K
    iters = G * T
    print(f'{variant}: {dt*1e3:7.2f} ms  {dt/iters*1e9:8.1f} ns/iter '
          f'({dt/iters/NPK*1e9:6.1f} ns/packet-step)')


if __name__ == '__main__':
    for v in (sys.argv[1:] or ['sA', 'sB', 'sC', 'sD']):
        run(v)
