"""Round-2 probe C: bisect the packet-step cost.
Variants toggle: dynamic table read / vector ops / vector->scalar reduce /
SMEM stack. Each runs T steps in one kernel."""
import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')

N, T = 1024, 4096

def make(read, vec, sreduce, stack):
    def kernel(tab_ref, rays_ref, out_ref, stack_ref, acc_ref):
        rays = rays_ref[:]
        acc_ref[0, 0] = 0.0
        stack_ref[0] = 0
        def body(i, carry):
            idx, sp, vacc = carry
            tile = tab_ref[idx] if read else rays * (1.0 + idx.astype(jnp.float32))
            if vec:
                a = (tile - rays) * rays
                b = jnp.maximum(a, tile * 0.5 + rays)
                c = jnp.minimum(b * b + a, a * 1.5 - tile)
            else:
                c = tile
            if sreduce:
                red = jnp.max(c)
                hit = red > 0.0
                acc_ref[0, 0] += red
            else:
                vacc = vacc + c
                hit = (i % 3) > 0
            nxt = (idx * 5 + 1) % N
            if stack:
                @pl.when(hit & (sp < 60))
                def _():
                    stack_ref[sp] = nxt
                sp2 = jnp.where(hit & (sp < 60), sp + 1, sp)
                sp3 = jnp.maximum(sp2 - 1, 0)
                popped = stack_ref[sp3]
                return (jnp.where(sp2 > 0, popped, nxt).astype(jnp.int32),
                        sp3.astype(jnp.int32), vacc)
            return (nxt.astype(jnp.int32), sp, vacc)
        _, _, vacc = jax.lax.fori_loop(
            0, T, body, (jnp.int32(0), jnp.int32(0), jnp.zeros((8,128), jnp.float32)))
        out_ref[:] = rays + acc_ref[0, 0] + vacc
    return kernel

tab = jnp.asarray(np.random.rand(N, 8, 128) - 0.5, jnp.float32)
rays = jnp.asarray(np.random.rand(8, 128), jnp.float32)

for name, flags in [
    ('loop only            ', (0,0,0,0)),
    ('read                  ', (1,0,0,0)),
    ('vec                   ', (0,1,0,0)),
    ('sreduce               ', (0,0,1,0)),
    ('stack                 ', (0,0,0,1)),
    ('read+vec              ', (1,1,0,0)),
    ('read+vec+sreduce      ', (1,1,1,0)),
    ('full                  ', (1,1,1,1)),
]:
    k = make(*flags)
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((64,), jnp.int32),
                        pltpu.SMEM((1, 1), jnp.float32)])
    try:
        g = jax.jit(f)
        out = g(tab, rays); _ = np.asarray(out[:1])
        best = 1e9
        for _t in range(3):
            t0 = time.perf_counter()
            out = g(tab, rays); _ = np.asarray(out[:1])
            best = min(best, time.perf_counter() - t0)
        print(f'{name}: {best*1e9/T:8.1f} ns/step')
    except Exception as e:
        print(f'{name}: FAIL', str(e).split(chr(10))[0][:120])
