import time, numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
N = 4096
tab = jnp.asarray(np.random.rand(N, 8), jnp.float32)
for B in [1024, 307200]:
    i0 = jnp.asarray(np.random.randint(0, N, B), jnp.int32)
    f = jax.jit(lambda i: jax.lax.fori_loop(0, 50, lambda k, i: (i + tab[i][:, 0].astype(jnp.int32) % 7 + 1) % N, i))
    out = f(i0); _ = np.asarray(out[:1])
    t0=time.time(); out = f(i0); _ = np.asarray(out[:1])
    print(f"B={B:>7}: {(time.time()-t0)/50*1e3:.2f} ms/step", flush=True)
