"""Round-2 probe A: which gather-ish formulations lower in Mosaic today,
with full error text (round-1 probes truncated them)."""
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')

def try_one(name, kernel, out_shape, *args):
    try:
        out = pl.pallas_call(
            kernel, out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)
        out.block_until_ready()
        return ('OK', out)
    except Exception as e:
        msg = str(e)
        # pull the interesting mosaic line if present
        lines = [l for l in msg.split('\n') if l.strip()]
        key = next((l for l in lines if 'not implemented' in l.lower()
                    or 'unsupported' in l.lower() or 'error' in l.lower()), lines[0] if lines else '')
        return ('FAIL', key[:300])

N, B = 16384, 1024
tab = jnp.asarray(np.random.rand(N, 128), jnp.float32)
idx1d = jnp.asarray(np.random.randint(0, N, size=B), jnp.int32)

# 1. row gather via advanced indexing
def k_rowgather(tab_ref, idx_ref, out_ref):
    out_ref[:] = tab_ref[:][idx_ref[:]]
st, info = try_one('rowgather', k_rowgather,
                   jax.ShapeDtypeStruct((B, 128), jnp.float32), tab, idx1d)
print('1 rowgather tab[idx]:', st, info if st == 'FAIL' else '')

# 2. take_along_axis axis=1 on transposed table [128, N], idx [128, B]
tabT = jnp.asarray(np.asarray(tab).T.copy(), jnp.float32)
idx2 = jnp.broadcast_to(idx1d[None, :], (128, B)).copy()
def k_taa1(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)
st, info = try_one('taa1', k_taa1,
                   jax.ShapeDtypeStruct((128, B), jnp.float32), tabT, idx2)
print('2 take_along_axis axis=1 [128,16384]:', st, info if st == 'FAIL' else '')
if st == 'OK':
    ref = np.take_along_axis(np.asarray(tabT), np.asarray(idx2), axis=1)
    print('   correct:', np.allclose(np.asarray(info), ref))

# 3. same but small N=128 (known to work per round 1)
tabT128 = tabT[:, :128]
idx3 = jnp.asarray(np.random.randint(0, 128, size=(128, B)), jnp.int32)
st, info = try_one('taa1-128', k_taa1,
                   jax.ShapeDtypeStruct((128, B), jnp.float32), tabT128, idx3)
print('3 take_along_axis axis=1 [128,128]:', st, info if st == 'FAIL' else '')

# 4. jax.lax.gather via jnp.take
def k_take(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)
st, info = try_one('take', k_take,
                   jax.ShapeDtypeStruct((B, 128), jnp.float32), tab, idx1d)
print('4 jnp.take axis=0:', st, info if st == 'FAIL' else '')

# 5. dynamic scalar-index row read in a loop (the packet primitive)
def k_scalar_rows(tab_ref, idx_ref, out_ref):
    def body(i, acc):
        row = tab_ref[idx_ref[i], :]          # [128] dynamic sublane index
        return acc + row
    out_ref[0, :] = jax.lax.fori_loop(0, B, body, jnp.zeros(128, jnp.float32))
st, info = try_one('scalar_rows', k_scalar_rows,
                   jax.ShapeDtypeStruct((1, 128), jnp.float32), tab, idx1d)
print('5 scalar-indexed row reads in fori_loop:', st, info if st == 'FAIL' else '')
