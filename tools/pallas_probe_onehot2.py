"""Probe: P-deep software-pipelined per-lane one-hot MXU traversal steps.

Round-4 shelved the per-lane one-hot design at 8 us/step flat in N
(tools/pallas_probe_onehot.py) with the note that it "would need ~8-deep
software pipelining to pay". This runs that experiment (round-5 verdict
item 4): P independent scripted chains advance TOGETHER each while_loop
iteration, so the (128*P, N) one-hot x (N, 128) table matmul amortizes
the table streaming and the serial next-index dependency across P chains.
If latency (not bandwidth) dominated the 8 us, cost/step should fall
~1/P until the MXU/VPU work floor.

Reported: ns per 128-lane step-equivalent (total time / (G*T*P)) for
P in {1,2,4,8,16} at N in {1024, 4096}, bf16 one-hot, plus exactness vs
a numpy replay of every chain.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/pallas_probe_onehot2.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 64           # traversal steps per kernel call (per chain)
G = 16           # grid cells (independent repeats)


def make_kernel(n_rows, p_chains, t_steps):
    R = 128 * p_chains

    def kernel(tab_ref, idx_ref, out_ref):
        # idx block is (p_chains, 128) i32 -> column vector (R, 1)
        idxc = idx_ref[:].reshape(R, 1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (R, n_rows), 1)

        def body(carry):
            step, idxc, acc = carry
            oh = (iota == idxc).astype(jnp.bfloat16)      # (R, N)
            rows = jax.lax.dot_general(
                oh, tab_ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (R, 128)
            nxt = (rows[:, 0:1].astype(jnp.int32) * 7 + step + 1) % n_rows
            return step + 1, nxt, acc + rows[:, 1:2]

        fin = jax.lax.while_loop(lambda c: c[0] < t_steps, body,
                                 (jnp.int32(0), idxc,
                                  jnp.zeros((R, 1), jnp.float32)))
        out_ref[0:p_chains, :] = fin[1].astype(jnp.float32).reshape(
            p_chains, 128)
        out_ref[p_chains:2 * p_chains, :] = fin[2].reshape(p_chains, 128)
    return kernel


@functools.partial(jax.jit, static_argnames=('n_rows', 'p_chains', 't_steps'))
def run(tab, idx, *, n_rows, p_chains, t_steps):
    return pl.pallas_call(
        make_kernel(n_rows, p_chains, t_steps),
        grid=(G,),
        out_shape=jax.ShapeDtypeStruct((G * 2 * p_chains, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((p_chains, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2 * p_chains, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tab.astype(jnp.bfloat16), idx)


def bench(n_rows, p_chains):
    rng = np.random.default_rng(0)
    tab = np.zeros((n_rows, 128), np.float32)
    tab[:, 0] = np.arange(n_rows)                    # idx echo for the chain
    tab[:, 1] = rng.integers(0, 1 << 15, n_rows)     # int payload (bf16-exact)
    tab[:, 2:] = 0.0
    tabj = jnp.asarray(tab)
    idx_np = rng.integers(0, n_rows, (G * p_chains, 128)).astype(np.int32)
    idx = jnp.asarray(idx_np)

    out = run(tabj, idx, n_rows=n_rows, p_chains=p_chains, t_steps=T)
    out.block_until_ready()
    K = 4
    t0 = time.perf_counter()
    outs = [run(tabj, idx, n_rows=n_rows, p_chains=p_chains, t_steps=T)
            for _ in range(K)]
    for o in outs:
        o.block_until_ready()
    _ = np.asarray(outs[-1][:1])
    dt = (time.perf_counter() - t0) / K
    per_group_step = dt / (G * T * p_chains)   # per 128-lane step-equivalent

    # exactness: replay every chain in numpy
    o = np.asarray(out).reshape(G, 2 * p_chains, 128)
    ok = True
    for g in range(G):
        for p in range(p_chains):
            cur = idx_np[g * p_chains + p].astype(np.int64)
            acc = np.zeros(128)
            for s in range(T):
                acc += tab[cur, 1]
                cur = (tab[cur, 0].astype(np.int64) * 7 + s + 1) % n_rows
            ok &= bool(np.array_equal(cur, o[g, p].astype(np.int64)))
            ok &= bool(np.array_equal(acc, o[g, p_chains + p]))
    print(f'N={n_rows:5d} P={p_chains:2d}: '
          f'{per_group_step*1e9:8.0f} ns / 128-lane step-equiv '
          f'({per_group_step*1e9/128:6.1f} ns/lane-step)  exact={ok}',
          flush=True)


if __name__ == '__main__':
    for n in (1024, 4096):
        for p in (1, 2, 4, 8, 16):
            bench(n, p)
