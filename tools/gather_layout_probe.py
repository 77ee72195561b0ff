"""Locate why the engine's pid-keyed 16-col table gather costs 19.6 ms
(fusion.1258, {1,0} row-major) when an isolated random gather of the same
shape costs ~1.0 ms (tools/cache_gather_bench.py).

Variants isolate one suspect at a time; all gather [T,16] -> [L,16] by the
same random ids inside a K-step fori_loop (one dispatch, RTT amortized):

  sum     consumer = whole-array sum (the fast microbench baseline)
  cols    consumer = per-column combine (c0*c1 + ... lane-major math)
  vec3    consumer = [L,3] block slices -> cross/dot chains (shade-like)
  carry   vec3, but the gather result feeds the NEXT iteration's indices
          (data-dependent chain like hit.prim_id -> shade)
  whilel  vec3 inside lax.while_loop (the engine's loop form)
  wl_sum  sum inside lax.while_loop

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/gather_layout_probe.py [variants]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')

T, L, K = 164620, 414720, 16
rng = np.random.default_rng(0)
idx = rng.integers(0, T, size=L).astype(np.int32)
tab_np = rng.standard_normal((T, 16)).astype(np.float32)


def consume_sum(g):
    return g.sum()


def consume_cols(g):
    acc = g[:, 0]
    for j in range(1, 16):
        acc = acc * 0.5 + g[:, j]
    return acc.sum()


def consume_vec3(g):
    v0, v1, v2 = g[:, 2:5], g[:, 5:8], g[:, 8:11]
    e1, e2 = v1 - v0, v2 - v0
    cr = jnp.cross(e1, e2)
    d = jnp.sum(cr * v0, axis=-1) + g[:, 0] + g[:, 1]
    return d.sum()


def consume_vecc(g):
    """vec3 math on INDIVIDUAL column vectors (no [L,3] block slices)."""
    c = [g[:, j] for j in range(16)]
    e1 = [c[5 + k] - c[2 + k] for k in range(3)]
    e2 = [c[8 + k] - c[2 + k] for k in range(3)]
    cr = [e1[1] * e2[2] - e1[2] * e2[1],
          e1[2] * e2[0] - e1[0] * e2[2],
          e1[0] * e2[1] - e1[1] * e2[0]]
    d = cr[0] * c[2] + cr[1] * c[3] + cr[2] * c[4] + c[0] + c[1]
    return d.sum()


def run(name, consumer, while_form=False, carry_idx=False, sort_idx=False,
        concat_form=False):
    """concat_form: pass the table as two [T,8] halves and jnp.concatenate
    them INSIDE the jit — the engine's trip table gets this form and XLA
    materializes the concat result into scoped VMEM (S(1) ConcatBitcast +
    async slice-done copies), making its gather ~9x faster than the
    plain-parameter form (fusion.1260 vs fusion.1258 in tpu_op_profile)."""
    tab = jnp.asarray(tab_np)
    ixd = jnp.asarray(np.sort(idx) if sort_idx else idx)

    @jax.jit
    def f(tab, ixd):
        if isinstance(tab, tuple):
            tab = jnp.concatenate(tab, axis=1)
        if while_form:
            def cond(c):
                return c[0] < K

            def body(c):
                i, acc, ix = c
                g = tab[ix]
                acc = acc + consumer(g)
                ix = jnp.roll(ix, 1)
                return (i + 1, acc, ix)
            return jax.lax.while_loop(cond, body, (0, jnp.float32(0), ixd))[1]

        def body(i, c):
            acc, ix = c
            g = tab[ix]
            acc = acc + consumer(g)
            if carry_idx:
                ix = jnp.abs(g[:, 3].astype(jnp.int32)) % T
            else:
                ix = jnp.roll(ix, 1)
            return (acc, ix)
        return jax.lax.fori_loop(0, K, body, (jnp.float32(0), ixd))[0]

    if concat_form:
        tab = (tab[:, :8].copy(), tab[:, 8:].copy())
    r = f(tab, ixd)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    np.asarray(f(tab, ixd))
    dt = (time.perf_counter() - t0 - 0.030) / K * 1e3
    print(f'{name:8s} {dt:7.2f} ms/gather')


def run_t(name, while_form=True):
    """Transposed table [16,T], gather along the minor axis -> [16,L];
    consumers read rows (already lane-major vectors)."""
    tab_t = jnp.asarray(tab_np.T.copy())
    ixd = jnp.asarray(idx)

    def consume_rows(g):
        v0 = g[2:5]
        v1 = g[5:8]
        v2 = g[8:11]
        e1, e2 = v1 - v0, v2 - v0
        cr = jnp.cross(e1, e2, axis=0)
        d = jnp.sum(cr * v0, axis=0) + g[0] + g[1]
        return d.sum()

    @jax.jit
    def f(tab_t, ixd):
        def cond(c):
            return c[0] < K

        def body(c):
            i, acc, ix = c
            g = tab_t[:, ix]
            acc = acc + consume_rows(g)
            return (i + 1, acc, jnp.roll(ix, 1))
        return jax.lax.while_loop(cond, body, (0, jnp.float32(0), ixd))[1]

    r = f(tab_t, ixd)
    r.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(f(tab_t, ixd))
    dt = (time.perf_counter() - t0 - 0.030) / K * 1e3
    print(f'{name:8s} {dt:7.2f} ms/gather')


sel = sys.argv[1:] or ['sum', 'cols', 'vec3', 'carry', 'whilel', 'wl_sum']
if 'tposed' in sel:
    run_t('tposed')
if 'sum' in sel:
    run('sum', consume_sum)
if 'cols' in sel:
    run('cols', consume_cols)
if 'vec3' in sel:
    run('vec3', consume_vec3)
if 'carry' in sel:
    run('carry', consume_vec3, carry_idx=True)
if 'whilel' in sel:
    run('whilel', consume_vec3, while_form=True)
if 'wl_sum' in sel:
    run('wl_sum', consume_sum, while_form=True)
if 'vecc' in sel:
    run('vecc', consume_vecc)
if 'vec3s' in sel:
    run('vec3s', consume_vec3, sort_idx=True)
if 'veccs' in sel:
    run('veccs', consume_vecc, sort_idx=True)
if 'vec3cat' in sel:
    run('vec3cat', consume_vec3, concat_form=True)
if 'wlcat' in sel:
    run('wlcat', consume_vec3, while_form=True, concat_form=True)
