"""Honest packet-kernel timing: pipeline K async calls, fetch once (the
~30 ms host<->tunnel RTT otherwise swamps every sub-50ms measurement)."""
import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.core import camera as cam_mod
from cuda_pathtracer_tpu.ops.traverse_wide import traverse_wide
from cuda_pathtracer_tpu.ops import traverse_packet as tpk
from cuda_pathtracer_tpu.ops import intersect as isect

scene = get_scene('sibenik', asset_dirs=['/root/reference', '.'])
arrays, dyn = scene.to_device(), scene.dynamic_arrays()
cam = cam_mod.Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
W, H = 1920, 192
ys, xs = np.mgrid[0:H, 0:W]
B = W * H
ro, rd = cam_mod.generate_rays_simple(
    cam, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()), W, 1080)
wd = -(-scene.wide_depth // 4) * 4
tables = tpk.split_packet_tables(np.asarray(dyn.wide_rows), scene.wide_depth)
TH, TW = 8, 16
perm = jnp.asarray(np.arange(B).reshape(H//TH, TH, W//TW, TW)
                   .transpose(0, 2, 1, 3).reshape(-1))

def bench(name, fn, *args, K=8):
    out = fn(*args)
    _ = np.asarray(out.t[:4])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(K)]
    _ = np.asarray(outs[-1].t[:4])
    for o_ in outs:
        o_.t.block_until_ready()
    dt = (time.perf_counter() - t0) / K
    print(f'{name}: {dt*1e3:8.2f} ms/call -> {B/dt/1e6:7.2f} Mrays/s')
    return out

pack_f = jax.jit(lambda a, b: tpk.traverse_packet(arrays, tables, a, b))
pack_any = jax.jit(lambda a, b, tm: tpk.traverse_packet(
    arrays, tables, a, b, t_max=tm, any_hit=True))
wide_f = jax.jit(lambda a, b: traverse_wide(arrays, dyn.wide_rows, wd, a, b))

h1 = bench('packet primary 8x16', pack_f, ro[perm], rd[perm])
bench('wide   primary     ', wide_f, ro, rd, K=3)

hitn = np.asarray(h1.t)
ron = np.asarray(ro[perm]); rdn = np.asarray(rd[perm])
hp = ron + rdn * (hitn[:, None] - 1e-3)
rng = np.random.default_rng(1)
d2 = rng.normal(size=(B, 3)).astype(np.float32)
d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
flip = (d2 * rdn).sum(1) > 0
d2[flip] = -d2[flip]

# morton sort of origins (10 bits/axis) + direction octant minor
q = ((hp - hp.min(0)) / (hp.ptp(0) + 1e-6) * 1023).astype(np.int64)
def spread(v):
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v
morton = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
oct_ = ((d2[:, 0] > 0).astype(np.int64) | ((d2[:, 1] > 0).astype(np.int64) << 1)
        | ((d2[:, 2] > 0).astype(np.int64) << 2))
order_m = np.argsort((morton << 3) | oct_, kind='stable')
order_om = np.argsort((oct_ << 30) | morton, kind='stable')
ro2 = jnp.asarray(hp); rd2 = jnp.asarray(d2)
om = jnp.asarray(order_m); oom = jnp.asarray(order_om)

bench('bounce tile-order  ', pack_f, ro2, rd2, K=3)
bench('bounce morton+oct  ', pack_f, ro2[om], rd2[om], K=3)
bench('bounce oct+morton  ', pack_f, ro2[oom], rd2[oom], K=3)
bench('wide   bounce      ', wide_f, ro2, rd2, K=3)

light_p = np.array([-4.0, 8.0, 0.0], np.float32)
sd = light_p[None, :] - hp
dist = np.linalg.norm(sd, axis=1, keepdims=True)
sd = sd / dist
tm3 = jnp.asarray(dist[:, 0] - 2e-3)
bench('shadow 8x16        ', pack_any, jnp.asarray(hp), jnp.asarray(sd), tm3)
