"""Realistic wavefront benchmark for the packet kernel: tile-packed
primaries, bounce-1 hemisphere rays from real hits, NEE shadow rays."""
import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.core import camera as cam_mod
from cuda_pathtracer_tpu.ops.traverse_wide import traverse_wide
from cuda_pathtracer_tpu.ops import traverse_packet as tpk

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

# tile permutation: 8x16 pixel tiles -> consecutive 128-lane packets
TH, TW = 8, 16
perm = (np.arange(B).reshape(H // TH, TH, W // TW, TW)
        .transpose(0, 2, 1, 3).reshape(-1))
perm_j = jnp.asarray(perm)

def bench(name, fn, *args):
    out = fn(*args)
    _ = np.asarray(out.t[:4])
    best = 1e9
    for _i in range(4):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(out.t[:4])
        best = min(best, time.perf_counter() - t0)
    print(f'{name}: {best*1e3:8.1f} ms  -> {B/best/1e6:7.2f} Mrays/s '
          f'(hit {float(jnp.mean(out.intersected)):.3f})')
    return out, best

wide_f = jax.jit(lambda ro, rd: traverse_wide(arrays, dyn.wide_rows, wd, ro, rd))
pack_f = jax.jit(lambda ro, rd: tpk.traverse_packet(arrays, tables, ro, rd))
pack_any = jax.jit(lambda ro, rd, tm: tpk.traverse_packet(
    arrays, tables, ro, rd, t_max=tm, any_hit=True))
wide_any = jax.jit(lambda ro, rd, tm: traverse_wide(
    arrays, dyn.wide_rows, wd, ro, rd, t_max=tm, any_hit=True))

print('--- primaries scanline vs tile ---')
h1, _ = bench('packet scanline', pack_f, ro, rd)
h2, _ = bench('packet 8x16    ', pack_f, ro[perm_j], rd[perm_j])

# bounce-1 wavefront from the real hits: cosine hemisphere about geometric
# normal approximated by -rd reflection jitter (good enough for coherence)
hit = h1
tnp = np.asarray(hit.t)
ron = np.asarray(ro); rdn = np.asarray(rd)
hp = ron + rdn * (tnp[:, None] - 1e-3)
rng = np.random.default_rng(1)
d2 = rng.normal(size=(B, 3)).astype(np.float32)
d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
# flip into the hemisphere facing back along the incoming ray
flip = (d2 * rdn).sum(1) > 0
d2[flip] = -d2[flip]
ro2 = jnp.asarray(hp, jnp.float32); rd2 = jnp.asarray(d2, jnp.float32)
print('--- bounce-1 (pixel order vs tile order) ---')
bench('wide   bounce   ', wide_f, ro2, rd2)
bench('packet bounce   ', pack_f, ro2, rd2)
bench('packet bounce 8x16', pack_f, ro2[perm_j], rd2[perm_j])
# octant+tile sort
oct_ = ((d2[:, 0] > 0).astype(np.int64) | ((d2[:, 1] > 0).astype(np.int64) << 1)
        | ((d2[:, 2] > 0).astype(np.int64) << 2))
key = oct_ * B + perm.argsort()[np.arange(B)]  # octant major, tile order minor
order = np.argsort(key, kind='stable')
oj = jnp.asarray(order)
bench('packet bounce oct+tile', pack_f, ro2[oj], rd2[oj])

print('--- NEE shadow rays (to the emissive cube) ---')
light_p = np.array([-4.0, 8.0, 0.0], np.float32)  # roughly the light zone
sd = light_p[None, :] - hp
dist = np.linalg.norm(sd, axis=1, keepdims=True)
sd = sd / dist
ro3 = jnp.asarray(hp, jnp.float32); rd3 = jnp.asarray(sd, jnp.float32)
tm3 = jnp.asarray(dist[:, 0] - 2e-3, jnp.float32)
bench('wide   shadow   ', wide_any, ro3, rd3, tm3)
bench('packet shadow   ', pack_any, ro3, rd3, tm3)
bench('packet shadow 8x16', pack_any, ro3[perm_j], rd3[perm_j], tm3[perm_j])
