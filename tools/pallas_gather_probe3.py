import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def k(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

for A, N, B in [(8, 2048, 2048), (8, 16384, 1024), (16, 131072, 1024)]:
    try:
        tab = jnp.asarray(np.random.rand(A, N), jnp.float32)
        idx = jnp.asarray(np.random.randint(0, N, size=(A, B)), jnp.int32)
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((A, B), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
        ref = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=1)
        print(f"A={A} N={N} B={B}:", np.allclose(np.asarray(out), ref))
    except Exception as e:
        print(f"A={A} N={N} B={B} FAIL:", str(e).split(chr(10))[0][:160])
