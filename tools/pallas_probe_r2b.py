"""Round-2 probe B: per-step cost of a packet-traversal-shaped Pallas loop.

Fake traversal: VMEM-resident node table [N, 8, 128]; each step reads the
tile at a data-dependent scalar index, does slab-test-sized VPU work against
a [8,128] ray block, pushes/pops a scalar SMEM stack. This is the cost model
for the real packet kernel: ns/step is THE number that decides the design.
"""
import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')

N = 1024     # nodes in table (4 KB each -> 4 MB)
T = 4096     # steps

def kernel(tab_ref, rays_ref, out_ref, stack_ref, acc_ref):
    rays = rays_ref[:]                      # [8,128]
    acc_ref[0, 0] = 0.0
    stack_ref[0] = 0

    def body(i, carry):
        idx, sp = carry
        tile = tab_ref[idx]                 # [8,128] dynamic-index read
        # slab-test-sized VPU work (~30 ops on (8,128))
        a = (tile - rays) * rays
        b = jnp.maximum(a, tile * 0.5 + rays)
        c = jnp.minimum(b * b + a, a * 1.5 - tile)
        red = jnp.max(c)                     # full reduce -> scalar
        hit = red > 0.0
        # scalar stack push/pop in SMEM
        nxt = (idx * 5 + 1) % N
        @pl.when(hit & (sp < 60))
        def _():
            stack_ref[sp] = nxt
        sp2 = jnp.where(hit & (sp < 60), sp + 1, sp)
        sp3 = jnp.maximum(sp2 - 1, 0)
        popped = stack_ref[sp3]
        acc_ref[0, 0] += red
        return (jnp.where(sp2 > 0, popped, nxt).astype(jnp.int32),
                sp3.astype(jnp.int32))

    jax.lax.fori_loop(0, T, body, (jnp.int32(0), jnp.int32(0)))
    out_ref[:] = rays + acc_ref[0, 0]

tab = jnp.asarray(np.random.rand(N, 8, 128) - 0.5, jnp.float32)
rays = jnp.asarray(np.random.rand(8, 128), jnp.float32)

f = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.SMEM((64,), jnp.int32),
                    pltpu.SMEM((1, 1), jnp.float32)],
)
try:
    out = jax.jit(f)(tab, rays)
    out.block_until_ready()
    _ = np.asarray(out[:1])
    for trial in range(3):
        t0 = time.perf_counter()
        out = jax.jit(f)(tab, rays)
        _ = np.asarray(out[:1])
        dt = time.perf_counter() - t0
        print(f'trial {trial}: {dt*1e9/T:.1f} ns/step  ({dt*1e3:.2f} ms total)')
except Exception as e:
    msg = str(e)
    lines = [l for l in msg.split('\n') if l.strip()]
    print('FAIL:')
    for l in lines[:15]:
        print('  ', l[:200])
