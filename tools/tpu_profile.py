import time, numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
N = 4096; B = 307200
tab = jnp.asarray(np.random.rand(N, 8), jnp.float32)
i0 = jnp.asarray(np.random.randint(0, N, B), jnp.int32)

def mk(body):
    return jax.jit(lambda i: jax.lax.fori_loop(0, 50, lambda k, i: body(i), i))

# body variants to count marginal per-op costs
def b_gather(i):
    return (i + tab[i][:, 0].astype(jnp.int32) % 7 + 1) % N
def b_gather_red(i):
    row = tab[i]
    m = jnp.min(row, axis=-1)  # small-axis reduction
    return (i + m.astype(jnp.int32) % 7 + 1) % N
def b_gather_5red(i):
    row = tab[i]
    a = jnp.min(row, axis=-1); b = jnp.max(row, axis=-1)
    c = jnp.sum(row, axis=-1); d = jnp.any(row > 0.5, axis=-1)
    e = jnp.argmin(row, axis=-1)
    return (i + (a+b+c).astype(jnp.int32) + d + e) % N
def b_gather_unrolled(i):
    row = tab[i]
    m = row[:, 0]
    for k in range(1, 8):
        m = jnp.minimum(m, row[:, k])
    return (i + m.astype(jnp.int32) % 7 + 1) % N

for name, body in [("gather", b_gather), ("gather+1red", b_gather_red),
                   ("gather+5red", b_gather_5red),
                   ("gather+unrolled-min", b_gather_unrolled)]:
    f = mk(body)
    out = f(i0); _ = np.asarray(out[:1])
    t0=time.time(); out = f(i0); _ = np.asarray(out[:1])
    print(f"{name}: {(time.time()-t0)/50*1e3:.2f} ms/step", flush=True)
