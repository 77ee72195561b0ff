import time, numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
B = 307_200
K = 20
for N in [2048, 16384, 170_000, 1_700_000]:
    for R in [8]:
        tab = jnp.asarray(np.random.rand(N, R), jnp.float32)
        def loop(i0):
            def body(k, i):
                row = tab[i]                        # [B, R]
                return (i + row[:, 0].astype(jnp.int32) % 7 + 1) % N
            return jax.lax.fori_loop(0, K, body, i0)
        f = jax.jit(loop)
        i0 = jnp.asarray(np.random.randint(0, N, B), jnp.int32)
        out = f(i0); jax.block_until_ready(out)
        t0 = time.time(); out = f(i0); jax.block_until_ready(out)
        dt = (time.time()-t0)/K
        print(f"N={N:>8} R={R}: {dt*1e3:6.2f} ms/step  ({B*R*4/dt/1e9:6.1f} GB/s)", flush=True)
