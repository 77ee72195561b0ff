"""Count REAL while-loop iterations per block in the packet kernel by adding
an iteration counter through the carry (output via the pad row)."""
import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import cuda_pathtracer_tpu.ops.traverse_packet as tpk
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.core import camera as cam_mod

# monkeypatch: wrap the kernel body's while loop with a counter
orig = tpk._kernel
def counting(npk, d, interpret):
    base = orig(npk, d, interpret)
    def kernel(itab, ltab, rays, t_out, stk_n, stk_m, t_s, gid_s, fnd_s, dec_s):
        # replicate base behaviour but count iterations: easiest is to call
        # base (cheap: runs the loop) then re-run a counting loop would double
        # cost; instead patch: we re-implement just the count by running the
        # base and using dec_s[0,3] incremented inside... cannot hook.
        base(itab, ltab, rays, t_out, stk_n, stk_m, t_s, gid_s, fnd_s, dec_s)
    return kernel

# simpler: patch the module's while_loop via jax.lax shim during trace
import jax.lax as lax
real_while = lax.while_loop
def counted_while(cond, body, init):
    def body2(c):
        inner, n = c
        return (body(inner), n + 1)
    def cond2(c):
        return cond(c[0])
    fin, n = real_while(cond2, body2, (init, jnp.int32(0)))
    counted_while.last_n = n
    return fin

def patched_kernel(npk, d, interpret):
    def kernel(itab, ltab, rays, t_out, stk_n, stk_m, t_s, gid_s, fnd_s, dec_s):
        lax.while_loop = counted_while
        try:
            orig(npk, d, interpret)(itab, ltab, rays, t_out, stk_n, stk_m,
                                    t_s, gid_s, fnd_s, dec_s)
        finally:
            lax.while_loop = real_while
        # overwrite the pad row of packet 0 with the iteration count
        t_out[3:4, :] = jnp.full((1, 128), 1.0, jnp.float32) \
            * counted_while.last_n.astype(jnp.float32)
    return kernel

tpk._kernel = patched_kernel
tpk._run_packets._clear_cache() if hasattr(tpk._run_packets, '_clear_cache') else None

scene = get_scene('sibenik', asset_dirs=['/root/reference', '.'])
arrays, dyn = scene.to_device(), scene.dynamic_arrays()
cam = cam_mod.Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
W, H = 1920, 192
ys, xs = np.mgrid[0:H, 0:W]
B = W * H
ro, rd = cam_mod.generate_rays_simple(
    cam, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()), W, 1080)
tables = tpk.split_packet_tables(np.asarray(dyn.wide_rows), scene.wide_depth)
TH, TW = 8, 16
perm = jnp.asarray((np.arange(B).reshape(H//TH, TH, W//TW, TW)
                    .transpose(0, 2, 1, 3).reshape(-1)))

# run via traverse_packet; pull the iteration counts back out of the raw call
# by re-running _run_packets directly
from cuda_pathtracer_tpu.ops import intersect as isect
rop, rdp = ro[perm], rd[perm]
inv = isect.safe_inv_dir(rdp)
t0 = jnp.full((B,), 3.0e38, jnp.float32)
fields = jnp.concatenate([
    jnp.moveaxis(rop.reshape(-1, 128, 3), -1, -2),
    jnp.moveaxis(rdp.reshape(-1, 128, 3), -1, -2),
    jnp.moveaxis(inv.reshape(-1, 128, 3), -1, -2),
    t0.reshape(-1, 1, 128),
    jnp.ones((B//128, 1, 128), jnp.float32),
    jnp.zeros((B//128, 1, 128), jnp.float32),
], axis=1).reshape(-1, 128)
out = tpk._run_packets(tables.inner, tables.leaf, fields,
                       depth=tables.depth, interpret=False)
out = np.asarray(out).reshape(-1, 4, 128)
iters = out[0::tpk.NPK, 3, 0]  # pad row of packet 0 per block... block stride
# out rows: per block NPK packets x 4 rows; block b pad row of packet 0:
blocks = out.reshape(-1, tpk.NPK, 4, 128)
it = blocks[:, 0, 3, 0]
print('blocks:', len(it), 'iters: mean', it.mean(), 'p50', np.percentile(it, 50),
      'p90', np.percentile(it, 90), 'max', it.max())
print('total packet-steps:', it.sum() * tpk.NPK)
