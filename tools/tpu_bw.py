import time, numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
x = jnp.asarray(np.random.rand(64_000_000).astype(np.float32))  # 256MB
f = jax.jit(lambda x: x * 2.0 + 1.0)
y = f(x); _ = np.asarray(y[:1])
t0=time.time()
for _ in range(10): y = f(y)
_ = np.asarray(y[:1]); dt=(time.time()-t0)/10
print(f"elementwise 256MB r+w: {dt*1e3:.1f} ms -> {0.512/dt:.0f} GB/s", flush=True)
# fori version (in-loop)
g = jax.jit(lambda x: jax.lax.fori_loop(0, 20, lambda k, v: v * 1.0000001 + 0.0001, x))
y = g(x); _ = np.asarray(y[:1])
t0=time.time(); y = g(x); _ = np.asarray(y[:1]); dt=(time.time()-t0)/20
print(f"loop-body elementwise 256MB: {dt*1e3:.1f} ms/step -> {0.512/dt:.0f} GB/s", flush=True)
