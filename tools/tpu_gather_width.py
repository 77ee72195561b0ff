import time, numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
B = 307_200
K = 20
N = 40_000
for R in [8, 32, 64, 128, 256]:
    tab = jnp.asarray(np.random.rand(N, R), jnp.float32)
    def loop(i0):
        def body(k, i):
            row = tab[i]
            return (i + row[:, 0].astype(jnp.int32) % 7 + 1) % N
        return jax.lax.fori_loop(0, K, body, i0)
    f = jax.jit(loop)
    i0 = jnp.asarray(np.random.randint(0, N, B), jnp.int32)
    out = f(i0); jax.block_until_ready(out)
    t0 = time.time(); out = f(i0); jax.block_until_ready(out)
    dt = (time.time()-t0)/K
    print(f"R={R:>4}: {dt*1e3:6.2f} ms/step ({B*R*4/dt/1e9:6.1f} GB/s, {dt/B*1e9:.2f} ns/row)", flush=True)
# also smaller batch to see latency vs throughput
for B2 in [65536, 16384]:
    R = 64
    tab = jnp.asarray(np.random.rand(N, R), jnp.float32)
    def loop2(i0):
        def body(k, i):
            row = tab[i]
            return (i + row[:, 0].astype(jnp.int32) % 7 + 1) % N
        return jax.lax.fori_loop(0, K, body, i0)
    f = jax.jit(loop2)
    i0 = jnp.asarray(np.random.randint(0, N, B2), jnp.int32)
    out = f(i0); jax.block_until_ready(out)
    t0 = time.time(); out = f(i0); jax.block_until_ready(out)
    dt = (time.time()-t0)/K
    print(f"B={B2} R=64: {dt*1e3:6.2f} ms/step ({dt/B2*1e9:.2f} ns/row)", flush=True)
