import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import traceback

N = 2048; B = 256
def k1(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)
try:
    tab = jnp.asarray(np.random.rand(N, 128), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, N, size=(B, 128)), jnp.int32)
    out = pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)
    ref = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=0)
    print("axis0 NxB:", np.allclose(np.asarray(out), ref))
except Exception as e:
    traceback.print_exc(limit=1)
    print("axis0 NxB FAIL")

# same-shape variant: B == N
try:
    tab = jnp.asarray(np.random.rand(N, 128), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, N, size=(N, 128)), jnp.int32)
    out = pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)
    ref = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=0)
    print("axis0 same-shape:", np.allclose(np.asarray(out), ref))
except Exception as e:
    print("axis0 same-shape FAIL:", str(e).split(chr(10))[0][:200])
