"""Probe: P-deep software-pipelined per-lane one-hot MXU traversal steps.

Round-4 shelved the per-lane one-hot design at 8 us/step flat in N
(tools/pallas_probe_onehot.py) with the note that it "would need ~8-deep
software pipelining to pay". This runs that experiment (round-5 verdict
item 4): P INDEPENDENT scripted chains advance together in each while_loop
iteration (P separate one-hot builds + dot_generals per step, no data
dependence between them), so the serial fetch->decode->next-index latency
of one chain overlaps the others'. If latency dominated the 8 us, cost per
128-lane step-equivalent should fall ~1/P until the MXU/VPU work floor.

Structure deliberately mirrors pallas_probe_onehot.py (same one-hot build,
same dot shape per chain, same scripted next-index chain) — only the
interleaving is new.

Reported: ns per 128-lane step-equivalent (total / (G*T*P)) for
P in {1,2,4,8} at N in {1024, 4096}, plus exactness vs a numpy replay.

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


def make_kernel(n_rows, p_chains, t_steps, dtype):
    def kernel(tab_ref, idx_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (128, n_rows), 1)
        idxcs = tuple(jnp.transpose(idx_ref[p:p + 1, :])    # (128, 1)
                      for p in range(p_chains))
        accs = tuple(jnp.zeros((128, 1), jnp.float32)
                     for _ in range(p_chains))

        def body(carry):
            step, idxcs, accs = carry
            nxts, naccs = [], []
            for p in range(p_chains):
                oh = (iota == idxcs[p]).astype(dtype)       # (128, N)
                rows = jax.lax.dot_general(
                    oh, tab_ref[:],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # (128, 128)
                nxts.append((rows[:, 0:1].astype(jnp.int32) * 7 + step + 1)
                            % n_rows)
                naccs.append(accs[p] + rows[:, 1:2])
            return step + 1, tuple(nxts), tuple(naccs)

        fin = jax.lax.while_loop(lambda c: c[0] < t_steps, body,
                                 (jnp.int32(0), idxcs, accs))
        for p in range(p_chains):
            out_ref[p:p + 1, :] = jnp.transpose(
                fin[1][p].astype(jnp.float32))
            out_ref[8 + p:8 + p + 1, :] = jnp.transpose(fin[2][p])
        for r in range(p_chains, 8):
            out_ref[r:r + 1, :] = jnp.zeros((1, 128), jnp.float32)
            out_ref[8 + r:8 + r + 1, :] = jnp.zeros((1, 128), jnp.float32)
    return kernel


@functools.partial(jax.jit, static_argnames=('n_rows', 'p_chains', 't_steps'))
def run(tab, idx, *, n_rows, p_chains, t_steps):
    dtype = jnp.bfloat16
    tabc = tab.astype(dtype)
    return pl.pallas_call(
        make_kernel(n_rows, p_chains, t_steps, dtype),
        grid=(G,),
        out_shape=jax.ShapeDtypeStruct((G * 16, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tabc, idx)


def bench(n_rows, p_chains):
    rng = np.random.default_rng(0)
    tab = np.zeros((n_rows, 128), np.float32)
    tab[:, 0] = np.arange(n_rows)                    # idx echo for the chain
    tab[:, 1] = rng.integers(0, 1 << 24, n_rows)     # int payload
    tab[:, 2:] = rng.random((n_rows, 126)) * 100
    tabj = jnp.asarray(tab)
    # like the original probe, exactness is judged against the bf16-rounded
    # table (the MXU consumes bf16 operands; accumulation is f32-exact)
    tab_bf = np.asarray(jnp.asarray(tab).astype(jnp.bfloat16)
                        .astype(jnp.float32))
    idx_np = rng.integers(0, n_rows, (G * 8, 128)).astype(np.int32)
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

    o = np.asarray(out).reshape(G, 16, 128)
    ok = True
    for g in range(0, G, 4):
        for p in range(p_chains):
            cur = idx_np[g * 8 + p].astype(np.int64)
            acc = np.zeros(128)
            for s in range(T):
                acc += tab_bf[cur, 1]
                cur = (tab_bf[cur, 0].astype(np.int64) * 7 + s + 1) % n_rows
            ok &= bool(np.array_equal(cur, o[g, p].astype(np.int64)))
            ok &= bool(np.array_equal(acc, o[g, 8 + p].astype(np.float64)))
    print(f'N={n_rows:5d} P={p_chains:2d}: '
          f'{per_group_step*1e9:8.0f} ns / 128-lane step-equiv '
          f'({per_group_step*1e9/128:6.1f} ns/lane-step)  exact={ok}',
          flush=True)


if __name__ == '__main__':
    for n in (1024, 4096):
        for p in (1, 2, 4, 8):
            bench(n, p)
