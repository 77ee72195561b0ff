"""TPU bench: Pallas dense-window segmented sum vs XLA segment_sum at the
real guiding shape (L = 3 * 414720 updates, S = 164620 * 8 + 1 segments).

Two distributions: 'clustered' (realistic — neighboring lanes hit the same
triangles, ~long dup runs) and 'uniform' (adversarial — maximal unique
segments, most window passes).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/guiding_kernel_bench.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(__file__) + '/..')
from cuda_pathtracer_tpu.ops.guiding_scatter import segment_sum_pairs

L = 3 * 414720
NT = 164620
S = NT * 8 + 1
K = int(os.environ.get('BENCH_K', '8'))


def mk(dist, seed):
    rng = np.random.default_rng(seed)
    valid = rng.random(L) < 0.62
    if dist == 'clustered':
        # ~blocks of neighboring lanes sharing a triangle
        base = rng.integers(0, NT, L // 64)
        tri = np.repeat(base, 64)[:L] + rng.integers(0, 3, L)
        tri = np.clip(tri, 0, NT - 1)
    else:
        tri = rng.integers(0, NT, L)
    seg = np.where(valid, tri * 8 + rng.integers(0, 8, L), S - 1)
    e = np.where(valid, rng.random(L) * 100, 0.0).astype(np.float32)
    w = valid.astype(np.float32)
    return (jnp.asarray(e), jnp.asarray(w), jnp.asarray(seg.astype(np.int32)))


@jax.jit
def xla_ref(e, w, seg):
    both = jnp.stack([e, w], axis=-1)
    out = jax.ops.segment_sum(both, seg, num_segments=S)
    return out[:, 0], out[:, 1]


def pallas_k(e, w, seg):
    return segment_sum_pairs(e, w, seg, num_segments=S)


def timeit(f, args, label):
    # K iterations inside one dispatch would need a scan; instead time K
    # sequential calls and subtract the ~30 ms RTT floor per call
    o = f(*args)
    jax.block_until_ready(o)
    _ = np.asarray(o[0][:1])
    t0 = time.perf_counter()
    for _ in range(K):
        o = f(*args)
    jax.block_until_ready(o)
    _ = np.asarray(o[0][:1])
    dt = (time.perf_counter() - t0) / K
    print(f'{label:28s} {dt*1e3:8.2f} ms/call wall '
          f'(~{max(dt-0.03,0)*1e3:6.2f} ms dev)', flush=True)
    return o


for dist in ('clustered', 'uniform'):
    args = mk(dist, 0)
    ref = timeit(xla_ref, args, f'{dist}: xla segment_sum')
    out = timeit(pallas_k, args, f'{dist}: pallas dense-window')
    for a, b, nm in ((ref[0], out[0], 'e'), (ref[1], out[1], 'w')):
        an, bn = np.asarray(a), np.asarray(b)
        err = np.max(np.abs(an - bn) / np.maximum(np.abs(an), 1.0))
        print(f'  {dist} {nm}: max rel err {err:.2e}')
