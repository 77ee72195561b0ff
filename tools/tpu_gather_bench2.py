import time, numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
N, B = 170_000, 307_200
tab8 = jnp.asarray(np.random.rand(N, 8), jnp.float32)
f = jax.jit(lambda t, i: t[i].sum(axis=1))
# different index array each call (precomputed on device)
idxs = [jnp.asarray(np.random.randint(0, N, B), jnp.int32) for _ in range(8)]
out = f(tab8, idxs[0]); jax.block_until_ready(out)
t0 = time.time()
for k in range(8):
    out = f(tab8, idxs[k])
jax.block_until_ready(out)
dt = (time.time()-t0)/8
print(f"row8 varying-idx: {dt*1e3:.2f} ms ({B*32/dt/1e9:.1f} GB/s)", flush=True)

# chained dependent gathers (like traversal): idx' derived from gather result
g = jax.jit(lambda t, i: (jnp.abs(t[i]).sum(axis=1).astype(jnp.int32)*7919 + i) % N)
i = idxs[0]
out = g(tab8, i); jax.block_until_ready(out)
t0 = time.time()
K = 50
for k in range(K):
    i = g(tab8, i)
jax.block_until_ready(i)
print(f"chained gather step: {(time.time()-t0)/K*1e3:.2f} ms", flush=True)

# while_loop with 200 chained gathers inside ONE jit
def loop(t, i):
    def body(c):
        k, i = c
        i = (jnp.abs(t[i]).sum(axis=1).astype(jnp.int32)*7919 + i) % N
        return k+1, i
    return jax.lax.while_loop(lambda c: c[0] < 200, body, (0, i))[1]
floop = jax.jit(loop)
out = floop(tab8, idxs[1]); jax.block_until_ready(out)
t0 = time.time()
out = floop(tab8, idxs[2]); jax.block_until_ready(out)
dt = time.time()-t0
print(f"while_loop 200 gather-steps: {dt*1e3:.1f} ms -> {dt/200*1e3:.2f} ms/step", flush=True)
