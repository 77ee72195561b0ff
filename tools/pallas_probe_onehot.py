"""Probe: per-lane table-row gather inside a Mosaic kernel via one-hot x
table matmul on the MXU.

Motivation: per-lane (GPU-style) BVH traversal needs each of 128 lanes to
fetch ITS OWN node row. take_along_axis doesn't lower on TPU; the candidate
mechanism is out[r, :] = sum_k onehot[r, k] * tab[k, :] — an MXU matmul with
a computed one-hot. Questions:
  1. does (128, N) iota-compare one-hot + dot_general lower at all?
  2. per-step cost vs N (the one-hot build/stream should dominate: N*256 B)
  3. is retrieval EXACT for integer-valued f32 table entries (needed for
     child refs / gids)? bf16 one-hot entries are exactly 0.0/1.0, so
     1.0*v + 0.0*... must reproduce v for |v| < 2^24 if the accumulation
     is f32.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/pallas_probe_onehot.py
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
G = 64           # grid cells (independent repeats)


def make_kernel(n_rows, dtype, t_steps):
    def kernel(tab_ref, idx_ref, out_ref):
        idx0 = idx_ref[0:1, :]                   # (1, 128) i32
        idxc = jnp.transpose(idx0)               # (128, 1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (128, n_rows), 1)

        def body(carry):
            step, idxc, acc = carry
            oh = (iota == idxc).astype(dtype)    # (128, N)
            rows = jax.lax.dot_general(
                oh, tab_ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (128, 128)
            # scripted next index: derived from the fetched row so the chain
            # is data-dependent like a real traversal (col 0 holds idx*1.0)
            nxt = (rows[:, 0:1].astype(jnp.int32) * 7 + step + 1) % n_rows
            return step + 1, nxt, acc + rows[:, 1:2]

        fin = jax.lax.while_loop(lambda c: c[0] < t_steps, body,
                                 (jnp.int32(0), idxc,
                                  jnp.zeros((128, 1), jnp.float32)))
        out_ref[0:1, :] = jnp.transpose(fin[1].astype(jnp.float32))
        out_ref[1:2, :] = jnp.transpose(fin[2])
        out_ref[2:8, :] = jnp.zeros((6, 128), jnp.float32)
    return kernel


@functools.partial(jax.jit, static_argnames=('n_rows', 'bf16', 't_steps'))
def run(tab, idx, *, n_rows, bf16, t_steps):
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    tabc = tab.astype(dtype) if bf16 else tab
    return pl.pallas_call(
        make_kernel(n_rows, dtype, t_steps),
        grid=(G,),
        out_shape=jax.ShapeDtypeStruct((G * 8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tabc, idx)


def bench(n_rows, bf16):
    rng = np.random.default_rng(0)
    tab = np.zeros((n_rows, 128), np.float32)
    tab[:, 0] = np.arange(n_rows)                    # idx echo for the chain
    tab[:, 1] = rng.integers(0, 1 << 24, n_rows)     # int-valued payload
    tab[:, 2:] = rng.random((n_rows, 126)) * 100
    tabj = jnp.asarray(tab)
    idx = jnp.asarray(rng.integers(0, n_rows, (G * 8, 128)), jnp.int32)

    out = run(tabj, idx, n_rows=n_rows, bf16=bf16, t_steps=T)
    out.block_until_ready()
    K = 4
    t0 = time.perf_counter()
    outs = [run(tabj, idx, n_rows=n_rows, bf16=bf16, t_steps=T)
            for _ in range(K)]
    _ = np.asarray(outs[-1][:1])
    for o in outs:
        o.block_until_ready()
    dt = (time.perf_counter() - t0) / K
    per_step = dt / (G * T)
    # exactness: replay the chain in numpy
    o = np.asarray(out).reshape(G, 8, 128)
    idx_n = np.asarray(idx).reshape(G, 8, 128)
    ok = True
    for g in range(0, G, 16):
        cur = idx_n[g, 0].astype(np.int64)
        acc = np.zeros(128)
        for s in range(T):
            acc += tab[cur, 1]
            cur = (tab[cur, 0].astype(np.int64) * 7 + s + 1) % n_rows
        ok &= bool(np.array_equal(cur, o[g, 0].astype(np.int64)))
        ok &= bool(np.array_equal(acc, o[g, 1].astype(np.float64)))
    print(f'N={n_rows:6d} {"bf16" if bf16 else "f32 "}: '
          f'{per_step*1e9:8.0f} ns/step (128 lanes) '
          f'{per_step*1e9/128:6.1f} ns/lane-step  exact={ok}', flush=True)


for n in (512, 1024, 2048, 4096, 8192):
    bench(n, True)
bench(1024, False)
bench(4096, False)
