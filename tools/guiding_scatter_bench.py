"""Microbench: the guiding segment_sum (fusion.79, ~50 ms/sample at 1.24M
updates into 1.3M segments) against sorted-scatter variants.

Variants:
  a) plain segment_sum (the shipped path)
  b) argsort keys -> permute -> segment_sum(indices_are_sorted=True)
  c) argsort keys -> permute -> sorted run-boundary reconstruction without
     any scatter: dense[seg] built via searchsorted-style gather per segment
     (gather over SEGMENTS, not updates: 1.3M gathers of a cumsum row)
  d) b but sorting once for both value columns via a packed key

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/guiding_scatter_bench.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')

L = 3 * 414720
T = 164620
S = T * 8 + 1

rng = np.random.default_rng(0)
# realistic key distribution: coherent-ish triangle ids (sorted-ish blocks)
tri = np.sort(rng.integers(0, T, L)).astype(np.int32)
blocks = rng.permutation(L // 128)
tri = tri.reshape(-1, 128)[blocks].reshape(-1)
bucket = rng.integers(0, 8, L).astype(np.int32)
valid = rng.random(L) < 0.55
seg_np = np.where(valid, tri * 8 + bucket, S - 1).astype(np.int32)
seg = jnp.asarray(seg_np)
vals = jnp.asarray(rng.random((L, 2)), jnp.float32)


@jax.jit
def v_a(seg, vals):
    return jax.ops.segment_sum(vals, seg, num_segments=S)


@jax.jit
def v_b(seg, vals):
    order = jnp.argsort(seg)
    seg_s = seg[order]
    vals_s = vals[order]
    return jax.ops.segment_sum(vals_s, seg_s, num_segments=S,
                               indices_are_sorted=True)


@jax.jit
def v_c(seg, vals):
    order = jnp.argsort(seg)
    seg_s = seg[order]
    vals_s = vals[order]
    csum = jnp.cumsum(vals_s, axis=0)
    # per-segment total = csum at last occurrence - csum at last occurrence
    # of the previous nonempty segment; find last occurrence per segment via
    # searchsorted (a parallel binary search -> gather, no scatter)
    idx = jnp.searchsorted(seg_s, jnp.arange(S, dtype=jnp.int32),
                           side='right')
    pad = jnp.zeros((1, 2), jnp.float32)
    c2 = jnp.concatenate([pad, csum], axis=0)
    return c2[idx] - c2[jnp.concatenate([jnp.zeros(1, jnp.int32), idx[:-1]])]


def bench(name, f):
    out = f(seg, vals)
    out.block_until_ready()
    _ = np.asarray(out[:1])
    K = 5
    t0 = time.perf_counter()
    outs = [f(seg, vals) for _ in range(K)]
    outs[-1].block_until_ready()
    _ = np.asarray(outs[-1][:1])
    dt = (time.perf_counter() - t0) / K
    print(f'{name}: {dt*1e3:8.2f} ms')
    return out


ra = bench('a plain segsum      ', v_a)
rb = bench('b sorted segsum     ', v_b)
rc = bench('c searchsorted-gather', v_c)
na, nb, nc = (np.asarray(ra), np.asarray(rb), np.asarray(rc))
print('b matches a:', np.allclose(na, nb, atol=1e-3),
      ' c matches a:', np.allclose(na, nc[:S], atol=1e-2))
