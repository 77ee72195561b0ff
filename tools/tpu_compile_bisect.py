import time, numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
N, WT, B = 170_000, 170_000, 307_200
node_box = jnp.asarray(np.random.rand(N, 6), jnp.float32)
node_meta = jnp.asarray(np.random.randint(0, N, (N, 3)), jnp.int32)
tris = jnp.asarray(np.random.rand(WT, 9), jnp.float32)
ro = jnp.asarray(np.random.rand(B, 3), jnp.float32)
rd = jnp.asarray(np.random.rand(B, 3), jnp.float32)

def variant_a(ro, rd):
    inv = 1.0/rd
    def cond(c): return jnp.any(c[0] >= 0) & (c[2] < 100)
    def body(c):
        node, t, k = c
        ni = jnp.maximum(node, 0)
        box = node_box[ni]; meta = node_meta[ni]
        t0 = (box[:, :3]-ro)*inv; t1 = (box[:, 3:6]-ro)*inv
        tmin = jnp.minimum(t0,t1).max(1); tmax = jnp.maximum(t0,t1).min(1)
        bhit = (tmax >= jnp.maximum(tmin,0)) & (tmin < t)
        nxt = jnp.where(bhit, node+1, meta[:,0] % N - 1)
        return jnp.where(node>=0, nxt, node), t, k+1
    return jax.lax.while_loop(cond, body, (jnp.zeros(B, jnp.int32), jnp.full(B, 1e9), 0))

def variant_b(ro, rd):
    inv = 1.0/rd
    def cond(c): return jnp.any(c[0] >= 0) & (c[2] < 100)
    def body(c):
        node, t, k = c
        ni = jnp.maximum(node, 0)
        box = node_box[ni]; meta = node_meta[ni]
        t0 = (box[:, :3]-ro)*inv; t1 = (box[:, 3:6]-ro)*inv
        tmin = jnp.minimum(t0,t1).max(1); tmax = jnp.maximum(t0,t1).min(1)
        bhit = (tmax >= jnp.maximum(tmin,0)) & (tmin < t)
        # leaf: 4-wide tri gather + MT
        idx = jnp.clip(meta[:,1:2] + jnp.arange(4)[None], 0, WT-1)   # [B,4]
        T = tris[idx]                                                 # [B,4,9]
        v0,v1,v2 = T[...,0:3],T[...,3:6],T[...,6:9]
        e1=v1-v0; e2=v2-v0
        pv = jnp.cross(rd[:,None,:], e2)
        det = (e1*pv).sum(-1)
        tt = jnp.where(jnp.abs(det)>1e-4, (e2*pv).sum(-1), 1e9)
        tbest = tt.min(1)
        t = jnp.minimum(t, tbest)
        nxt = jnp.where(bhit, node+1, meta[:,0] % N - 1)
        return jnp.where(node>=0, nxt, node), t, k+1
    return jax.lax.while_loop(cond, body, (jnp.zeros(B, jnp.int32), jnp.full(B, 1e9), 0))

for name, fn in [("A node-gather+slab", variant_a), ("B +tri-gather", variant_b)]:
    f = jax.jit(fn)
    t0=time.time(); out = f(ro, rd); jax.block_until_ready(out)
    tc = time.time()-t0
    t0=time.time(); out = f(ro, rd); jax.block_until_ready(out); tr = time.time()-t0
    print(f"{name}: compile+run {tc:.1f}s, run {tr*1e3:.1f} ms", flush=True)
