"""Does raising xla_tpu_scoped_vmem_limit_kib make XLA stage MORE gather
tables into scoped VMEM (S(1)) — the 9x gather-speed difference between the
engine's trip table (VMEM-staged, 0.75 ms/call) and tri_meta (HBM, 6.5 ms)?

Two [T,16] tables (10.5 MB each) gathered per iteration; at the default
scoped budget (~16 MB) only one fits. Timings + S(1) presence in HLO per
budget setting, via per-jit compiler_options.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/scoped_vmem_probe.py
"""
import re
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')

T, L, K = 164620, 414720, 16
rng = np.random.default_rng(0)
idx = rng.integers(0, T, size=L).astype(np.int32)
tabA = jnp.asarray(rng.standard_normal((T, 16)), jnp.float32)
tabB = jnp.asarray(rng.standard_normal((T, 16)), jnp.float32)
ixd = jnp.asarray(idx)


def f(tabA, tabB, ixd):
    def body(c):
        i, acc, ix = c
        gA = tabA[ix]
        gB = tabB[jnp.roll(ix, 7)]
        v0, v1, v2 = gA[:, 2:5], gA[:, 5:8], gA[:, 8:11]
        w0, w1, w2 = gB[:, 2:5], gB[:, 5:8], gB[:, 8:11]
        cr = jnp.cross(v1 - v0, v2 - v0) + jnp.cross(w1 - w0, w2 - w0)
        d = jnp.sum(cr * (v0 + w2), axis=-1) + gA[:, 0] + gB[:, 1]
        return (i + 1, acc + d.sum(), jnp.roll(ix, 1))
    return jax.lax.while_loop(lambda c: c[0] < K, body,
                              (0, jnp.float32(0), ixd))[1]


for kib in [None, 16 * 1024, 64 * 1024, 96 * 1024]:
    opts = ({} if kib is None
            else {'xla_tpu_scoped_vmem_limit_kib': str(kib)})
    lowered = jax.jit(f).lower(tabA, tabB, ixd)
    comp = lowered.compile(compiler_options=opts) if opts else \
        lowered.compile()
    txt = comp.as_text()
    n_s1_tables = len(set(re.findall(
        r'f32\[164620,16\]\{[01],[01]:T\(8,128\)S\(1\)\}', txt)))
    gl = re.findall(r'f32\[414720,16\]\{([01]),([01])[^}]*\} fusion', txt)
    r = comp(tabA, tabB, ixd)
    r.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(comp(tabA, tabB, ixd))
    dt = (time.perf_counter() - t0 - 0.030) / K * 1e3
    print(f'scoped_kib={kib}: {dt:6.2f} ms/iter (2 gathers), '
          f'S(1) table shapes={n_s1_tables}, gather layouts={gl[:4]}')
