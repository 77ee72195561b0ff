"""Why is the radiance-cache row gather ([164620,8] -> [414720,8]) 19.7 ms
when the neighboring 24-col row gather costs 2.25 ms (tools/tpu_op_profile.py,
fusion.1271 vs fusion.1273)?

Variants, all gathered by the SAME unsorted hit-tri-id index vector inside a
K-iteration fori_loop (one jit dispatch, RTT amortized; the index vector is
rolled per iteration so XLA can't hoist the gather):

  w8      table [T,8]   -> [L,8]    (the engine's shape today)
  w8s     same, indices sorted ascending (locality upper bound)
  w16     table [T,16]  -> [L,16]   (cache padded to 16 cols)
  w24     table [T,24]  -> [L,24]   (the fast neighbor's shape)
  w32     table [T,32]  -> [L,32]   (cache appended to the 24-col rows)
  w8of32  table [T,32]  -> [L,32], keep [:, :8] (pad-only, discard rest)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/cache_gather_bench.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')

T, L, K = 164620, 414720, 16
rng = np.random.default_rng(0)
# clustered indices like real sorted-ray hit ids: runs of nearby triangles
base = rng.integers(0, T, size=L // 16)
idx = np.clip(np.repeat(base, 16) + rng.integers(-8, 8, size=L), 0, T - 1)
idx = idx.astype(np.int32)

dev = jax.devices()[0]
print('device:', dev)


def bench(name, width, sort_idx=False, keep8=False):
    tab = jnp.asarray(rng.standard_normal((T, width)), jnp.float32)
    ix = np.sort(idx) if sort_idx else idx
    ixd = jax.device_put(jnp.asarray(ix))

    @jax.jit
    def run(tab, ixd):
        def body(i, acc):
            ii = jnp.roll(ixd, i)
            g = tab[ii]
            if keep8:
                g = g[:, :8]
            return acc + g.sum()
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    r = run(tab, ixd)
    r.block_until_ready()
    t0 = time.perf_counter()
    r = run(tab, ixd)
    np.asarray(r)
    dt = (time.perf_counter() - t0 - 0.030) / K * 1e3
    print(f'{name:8s} width={width:3d}  {dt:7.2f} ms/gather '
          f'({L * width * 4 / dt / 1e6:.1f} GB/s out)')


bench('w2', 2)
bench('w2of16', 16, keep8=True)   # keep8 keeps [:, :8]; close enough: pad-only
bench('w8', 8)
bench('w8s', 8, sort_idx=True)
bench('w16', 16)
bench('w24', 24)
bench('w32', 32)
bench('w8of32', 32, keep8=True)
