"""Probe F: (1) how big a VMEM-resident table Mosaic accepts on this chip;
(2) realistic packet-traversal step cost: [1,128] row read from [N,128],
box extract via reshape, [16,128] slab vs 128 rays, scalar select + SMEM
stack, interleaved NI packets."""
import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')

# ---- part 1: VMEM capacity ----
for mb in (8, 14, 20, 32, 64, 100):
    N = mb * 1024 * 1024 // 512
    tab = jnp.zeros((N, 128), jnp.float32)
    def k(t_ref, o_ref):
        o_ref[:] = t_ref[0:8, :] + t_ref[N - 8:N, :]
    try:
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
        )(tab)
        out.block_until_ready()
        print(f'VMEM {mb} MB table: OK')
    except Exception as e:
        print(f'VMEM {mb} MB table: FAIL', str(e).split(chr(10))[0][:120])
        break

# ---- part 2: realistic step ----
N, T = 16384, 16384
ARITY = 16

def make(T, NI):
    def kernel(tab_ref, ro_ref, ird_ref, out_ref, stack_ref):
        o = ro_ref[:]        # [3*NI, 128]  origins per packet
        ird = ird_ref[:]     # [3*NI, 128]
        for p in range(NI):
            stack_ref[p, 0] = 0
            stack_ref[p, 1] = 0

        def body(i, carry):
            idxs, sps, ts = carry
            new_idxs, new_sps, new_ts = [], [], []
            rows = [tab_ref[idxs[p]] for p in range(NI)]   # [128] each
            sels, masks = [], []
            for p in range(NI):
                row = rows[p]
                box = row[1:97].reshape(6, ARITY)          # relayout
                lo = box[0:3].T[:, :, None]                # [16,3,1]
                hi = box[3:6].T[:, :, None]
                op = o[3*p:3*p+3][None]                    # [1,3,128]
                ip = ird[3*p:3*p+3][None]
                bt0 = (lo - op) * ip                       # [16,3,128]
                bt1 = (hi - op) * ip
                tmin = jnp.max(jnp.minimum(bt0, bt1), axis=1)   # [16,128]
                tmax = jnp.min(jnp.maximum(bt0, bt1), axis=1)
                hitc = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < ts[p])
                tsel = jnp.where(hitc, tmin, 3e38)
                per_child = jnp.min(tsel, axis=1)          # [16]
                anyc = jnp.any(hitc, axis=1)               # [16]
                enc = jnp.where(anyc, per_child, 3e38)
                bestc = jnp.argmin(enc)                    # scalar
                nmask = jnp.sum(jnp.where(
                    anyc, 2 ** jnp.arange(ARITY, dtype=jnp.int32), 0))
                sels.append(bestc.astype(jnp.int32))
                masks.append(nmask)
                new_ts.append(ts[p] * 0.9999)
            for p in range(NI):
                sp = sps[p]
                hit = masks[p] > 0
                nxt = (idxs[p] * 7 + sels[p] + 1) % N
                @pl.when(hit & (sp < 62))
                def _(p=p, nxt=nxt, sp=sp):
                    stack_ref[p, sp] = nxt
                sp2 = jnp.where(hit & (sp < 62), sp + 1, sp)
                sp3 = jnp.maximum(sp2 - 1, 0)
                popped = stack_ref[p, sp3]
                new_idxs.append(jnp.where(sp2 > 0, popped, nxt).astype(jnp.int32))
                new_sps.append(sp3.astype(jnp.int32))
            return (tuple(new_idxs), tuple(new_sps), tuple(new_ts))

        fin = jax.lax.fori_loop(
            0, T, body,
            (tuple(jnp.int32(p) for p in range(NI)),
             tuple(jnp.int32(0) for _ in range(NI)),
             tuple(jnp.float32(3e38) for _ in range(NI))))
        out_ref[:] = o + fin[2][0]
    return kernel

tab = jnp.asarray(np.random.rand(N, 128) * 2 - 1, jnp.float32)
for NI in (1, 2, 4):
    ro = jnp.asarray(np.random.rand(3 * NI, 128), jnp.float32)
    ird = jnp.asarray(np.random.rand(3 * NI, 128) + 0.5, jnp.float32)
    f = pl.pallas_call(
        make(T, NI), out_shape=jax.ShapeDtypeStruct((3 * NI, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((NI, 64), jnp.int32)])
    try:
        g = jax.jit(f)
        out = g(tab, ro, ird); _ = np.asarray(out[:1])
        times = []
        for _t in range(4):
            t0 = time.perf_counter()
            out = g(tab, ro, ird); _ = np.asarray(out[:1])
            times.append(time.perf_counter() - t0)
        best = min(times)
        # subtract ~29ms tunnel overhead measured earlier? report raw total
        print(f'NI={NI}: total {best*1e3:.1f} ms for {T} steps '
              f'-> {(best)*1e9/T:.0f} ns/step raw')
    except Exception as e:
        msg = [l for l in str(e).split('\n') if l.strip()][:8]
        print(f'NI={NI} FAIL:')
        for l in msg: print('   ', l[:200])
