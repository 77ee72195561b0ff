import time, numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')

def bench(fn, *args, n=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time()-t0)/n

N, B = 170_000, 307_200
tab8 = jnp.asarray(np.random.rand(N, 8), jnp.float32)
tab128 = jnp.asarray(np.random.rand(N, 128), jnp.float32)
tab1 = jnp.asarray(np.random.rand(N), jnp.float32)
idx = jnp.asarray(np.random.randint(0, N, B), jnp.int32)

f_row8 = jax.jit(lambda t, i: t[i])
f_row128 = jax.jit(lambda t, i: t[i])
f_flat = jax.jit(lambda t, i: t[i])
f_sorted = jax.jit(lambda t, i: t[jnp.sort(i)])

print(f"row8   [B,8] : {bench(f_row8, tab8, idx)*1e3:.2f} ms  ({B*32/bench(f_row8, tab8, idx)/1e9:.1f} GB/s)", flush=True)
print(f"row128 [B,128]: {bench(f_row128, tab128, idx)*1e3:.2f} ms", flush=True)
print(f"flat   [B]   : {bench(f_flat, tab1, idx)*1e3:.2f} ms", flush=True)
print(f"row8 sorted  : {bench(f_sorted, tab8, idx)*1e3:.2f} ms", flush=True)
# one-hot matmul gather for comparison (small table)
Nsm = 2048
tab_sm = jnp.asarray(np.random.rand(Nsm, 8), jnp.float32)
idx_sm = jnp.asarray(np.random.randint(0, Nsm, B), jnp.int32)
def onehot_gather(t, i):
    oh = jax.nn.one_hot(i, Nsm, dtype=jnp.bfloat16)
    return oh @ t.astype(jnp.bfloat16)
f_oh = jax.jit(onehot_gather)
print(f"onehot 2048  : {bench(f_oh, tab_sm, idx_sm)*1e3:.2f} ms", flush=True)
