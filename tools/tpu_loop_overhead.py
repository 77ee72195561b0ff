import time, numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
B = 307_200; K = 50; N = 40_000
tab = jnp.asarray(np.random.rand(N, 8), jnp.float32)
i0 = jnp.asarray(np.random.randint(0, N, B), jnp.int32)

def t_loop(name, body):
    f = jax.jit(lambda i0: jax.lax.fori_loop(0, K, body, i0))
    out = f(i0); jax.block_until_ready(out)
    t0 = time.time(); out = f(i0); jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/K*1e3:.3f} ms/step", flush=True)

t_loop("arith only", lambda k, i: (i * 1664525 + 1013904223) % N)
t_loop("1 gather", lambda k, i: (i + tab[i][:, 0].astype(jnp.int32) % 7 + 1) % N)
def two_gather(k, i):
    a = tab[i][:, 0]
    j = (i + a.astype(jnp.int32) % 7 + 1) % N
    b = tab[j][:, 1]
    return (j + b.astype(jnp.int32) % 5 + 1) % N
t_loop("2 gathers", two_gather)
