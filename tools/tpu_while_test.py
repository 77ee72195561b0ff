import time, numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
B = 307_200; N = 40_000
tab = jnp.asarray(np.random.rand(N, 8), jnp.float32)
i0 = jnp.asarray(np.random.randint(0, N, B), jnp.int32)

def step(i):
    row = tab[i]
    return (i + row[:, 0].astype(jnp.int32) % 7 + 1) % N

# 1) fori fixed 64
f1 = jax.jit(lambda i: jax.lax.fori_loop(0, 64, lambda k, i: step(i), i))
# 2) while with predicate, 64 iterations (count-based pred but dynamic)
def w2(i):
    def cond(c): return c[0] < 64
    def body(c): return (c[0]+1, step(c[1]))
    return jax.lax.while_loop(cond, body, (jnp.asarray(0), i))[1]
f2 = jax.jit(w2)
# 3) while with DATA-dependent predicate (any) — 64 iterations worth
def w3(i):
    def cond(c): return jnp.any(c[0] < 64) & (c[0][0] < 64)
    def body(c): return (c[0]+1, step(c[1]))
    return jax.lax.while_loop(cond, body, (jnp.zeros(B, jnp.int32), i))[1]
f3 = jax.jit(w3)
# 4) while(any) checking every 8 inner fori steps
def w4(i):
    def cond(c): return c[0][0] < 64
    def body(c):
        k, i = c
        i = jax.lax.fori_loop(0, 8, lambda q, x: step(x), i)
        return (k+8, i)
    return jax.lax.while_loop(cond, body, (jnp.zeros(B, jnp.int32), i))[1]
f4 = jax.jit(w4)

for name, f in [("fori-64", f1), ("while-scalar-64", f2), ("while-any-64", f3), ("while-chunk8-64", f4)]:
    out = f(i0); _ = np.asarray(out[:1])
    t0=time.time(); out = f(i0); _ = np.asarray(out)
    print(f"{name}: {(time.time()-t0)*1000:.0f} ms total ({(time.time()-t0)/64*1000:.2f} ms/step)", flush=True)
