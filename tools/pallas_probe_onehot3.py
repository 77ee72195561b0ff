"""Probe: SOFTWARE-PIPELINED per-lane one-hot MXU row fetch (VERDICT r4 #4).

pallas_probe_onehot.py measured the per-lane one-hot fetch chain at ~8 us
per 128-lane step FLAT in table size N -- pure dependent-latency (one-hot
build -> MXU -> i32 round-trip -> next index), not throughput. The shelved
question: does issuing W INDEPENDENT lane-groups per loop iteration (W*128
lanes in flight, W independent matmul chains) hide that latency and drop
the per-lane-step price toward the MXU streaming floor?

Each group carries its own index vector and scripted data-dependent chain
(identical arithmetic to the W=1 probe), so one while_loop step issues W
independent one-hot builds + dot_generals that Mosaic can overlap. This is
exactly the "~8-deep software pipelining" PERF.md's ceiling ablation said
the per-lane design needs.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/pallas_probe_onehot3.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 64           # traversal steps per kernel call
G = 16           # grid cells (independent repeats)


def make_kernel(n_rows, t_steps, width):
    def kernel(tab_ref, idx_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (128, n_rows), 1)
        idx0 = [jnp.transpose(idx_ref[w:w + 1, :]) for w in range(width)]
        acc0 = [jnp.zeros((128, 1), jnp.float32) for _ in range(width)]

        def body(carry):
            step = carry[0]
            idxc = carry[1:1 + width]
            acc = carry[1 + width:]
            nxt, nacc = [], []
            for w in range(width):
                oh = (iota == idxc[w]).astype(jnp.bfloat16)   # (128, N)
                rows = jax.lax.dot_general(
                    oh, tab_ref[:],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)       # (128, 128)
                nxt.append((rows[:, 0:1].astype(jnp.int32) * 7 + step + 1)
                           % n_rows)
                nacc.append(acc[w] + rows[:, 1:2])
            return (step + 1, *nxt, *nacc)

        fin = jax.lax.while_loop(lambda c: c[0] < t_steps, body,
                                 (jnp.int32(0), *idx0, *acc0))
        for w in range(width):
            out_ref[w:w + 1, :] = jnp.transpose(
                fin[1 + w].astype(jnp.float32))
            out_ref[width + w:width + w + 1, :] = jnp.transpose(
                fin[1 + width + w])
    return kernel


@functools.partial(jax.jit, static_argnames=('n_rows', 't_steps', 'width'))
def run(tab, idx, *, n_rows, t_steps, width):
    rows8 = -(-2 * width // 8) * 8
    return pl.pallas_call(
        make_kernel(n_rows, t_steps, width),
        grid=(G,),
        out_shape=jax.ShapeDtypeStruct((G * rows8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((width, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows8, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tab.astype(jnp.bfloat16), idx)


def bench(n_rows, width):
    rng = np.random.default_rng(0)
    tab = np.zeros((n_rows, 128), np.float32)
    tab[:, 0] = np.arange(n_rows)
    tab[:, 1] = rng.integers(0, 1 << 24, n_rows)
    tab[:, 2:] = rng.random((n_rows, 126)) * 100
    tabj = jnp.asarray(tab)
    idx = jnp.asarray(rng.integers(0, n_rows, (G * width, 128)), jnp.int32)

    out = run(tabj, idx, n_rows=n_rows, t_steps=T, width=width)
    out.block_until_ready()
    K = 4
    t0 = time.perf_counter()
    outs = [run(tabj, idx, n_rows=n_rows, t_steps=T, width=width)
            for _ in range(K)]
    for o in outs:
        o.block_until_ready()
    dt = (time.perf_counter() - t0) / K
    per_step = dt / (G * T)            # one W-wide loop step
    per_fetch = per_step / width       # one 128-lane row fetch
    # exactness: replay group 0 of grid cell 0 in numpy
    rows8 = -(-2 * width // 8) * 8
    o = np.asarray(out).reshape(G, rows8, 128)
    idx_n = np.asarray(idx).reshape(G, width, 128)
    cur = idx_n[0, 0].astype(np.int64)
    acc = np.zeros(128)
    for s in range(T):
        acc += tab[cur, 1]
        cur = (tab[cur, 0].astype(np.int64) * 7 + s + 1) % n_rows
    ok = bool(np.array_equal(cur, o[0, 0].astype(np.int64)))
    ok &= bool(np.array_equal(acc, o[0, width].astype(np.float64)))
    print(f'N={n_rows:6d} W={width:2d}: {per_step*1e9:8.0f} ns/step '
          f'{per_fetch*1e9:8.0f} ns/128-lane-fetch '
          f'{per_fetch*1e9/128:6.1f} ns/lane-visit  exact={ok}', flush=True)


for n in (1024, 4096, 8192):
    for w in (1, 2, 4, 8):
        bench(n, w)
