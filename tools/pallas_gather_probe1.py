import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4096   # table rows
B = 1024   # lanes

def kernel(tab_ref, idx_ref, out_ref):
    idx = idx_ref[:]                      # i32[B]
    tab = tab_ref[:]                      # f32[N, 8]
    out_ref[:] = tab[idx]                 # per-lane row gather

tab = jnp.asarray(np.random.rand(N, 8), jnp.float32)
idx = jnp.asarray(np.random.randint(0, N, size=B), jnp.int32)

out = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((B, 8), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(tab, idx)
ref = np.asarray(tab)[np.asarray(idx)]
print("row-gather ok:", np.allclose(np.asarray(out), ref))
