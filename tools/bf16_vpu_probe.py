"""Is a bf16 slab-test chain actually ~2x cheaper per ELEMENT than f32 on
the VPU inside a Mosaic kernel?  (16,128) bf16 = 1 vreg vs f32 = 2 vregs —
if bf16 ops retire per-vreg at the f32 rate, the packet kernel's inner-visit
slab math halves by storing conservatively-rounded bf16 box planes.

Times K chained slab-like steps (6 fma + 6 min/max + compare per step) on a
(16,128) block, f32 vs bf16, plus the bf16->f32 widen variant (compute in
f32 on bf16-loaded data: tests whether the win needs bf16 ARITHMETIC or
just bf16 STORAGE).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bf16_vpu_probe.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')

K = 20000
R = 64   # independent row-blocks to defeat latency-bounding


def make(dtype, widen=False):
    cdt = jnp.float32 if widen else dtype

    def kernel(x_ref, o_ref):
        x = x_ref[:].astype(cdt)
        iv = x * jnp.asarray(1.0009765625, cdt)
        oiv = x * jnp.asarray(0.999, cdt)

        def body(i, c):
            lo, hi = c
            t0 = lo * iv - oiv
            t1 = hi * iv - oiv
            t0b = lo * oiv - iv
            t1b = hi * oiv - iv
            tmin = jnp.maximum(jnp.minimum(t0, t1), jnp.minimum(t0b, t1b))
            tmax = jnp.minimum(jnp.maximum(t0, t1), jnp.maximum(t0b, t1b))
            hit = tmax >= tmin
            # keep magnitudes O(1) across K steps: swap-style update, no
            # multiplicative decay (decay drove the f32 variant into a
            # pathological regime in the first version of this probe)
            lo = jnp.where(hit, -hi, lo)
            hi = jnp.where(hit, tmin, hi)
            return lo, hi
        lo, hi = jax.lax.fori_loop(0, K, body, (x, x + jnp.asarray(1, cdt)))
        o_ref[:] = (lo + hi).astype(dtype)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((16 * R, 128), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    return run


rng = np.random.default_rng(0)
x32 = jnp.asarray(rng.standard_normal((16 * R, 128)), jnp.float32)
x16 = x32.astype(jnp.bfloat16)

for name, dtype, x, widen in [('f32', jnp.float32, x32, False),
                              ('bf16', jnp.bfloat16, x16, False),
                              ('bf16->f32', jnp.bfloat16, x16, True)]:
    run = make(dtype, widen)
    r = run(x)
    r.block_until_ready()
    t0 = time.perf_counter()
    r = run(x)
    r.block_until_ready()
    _ = np.asarray(r[:1, :1])
    dt = time.perf_counter() - t0 - 0.030
    # elements processed: 16*R*128 per step, K steps, ~14 ops per step
    eps = 16 * R * 128 * K / dt / 1e9
    print(f'{name:10s} {dt*1e3:8.1f} ms  {eps:7.1f} Gelem-steps/s')
