"""Packet-kernel vs XLA-wide traversal on the real chip (sibenik, primary
wavefront + incoherent wavefront)."""
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
W, H = 1920, 192          # one 1080p-style band, 368640 rays
ys, xs = np.mgrid[0:H, 0:W]
ro, rd = cam_mod.generate_rays_simple(
    cam, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()), W, 1080)
B = W * H
wd = -(-scene.wide_depth // 4) * 4
tables = tpk.split_packet_tables(np.asarray(dyn.wide_rows), scene.wide_depth)
print('tables:', tables.inner.shape, tables.leaf.shape,
      'VMEM MB:', (tables.inner.size + tables.leaf.size) * 4 / 1e6)

rng = np.random.default_rng(0)
# incoherent wavefront: random origins inside the hall, random dirs
ro2 = jnp.asarray(rng.uniform([-8, 0, -18], [8, 12, 14], (B, 3)), jnp.float32)
d2 = rng.normal(size=(B, 3)); d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
rd2 = jnp.asarray(d2, jnp.float32)

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
    return out

wide_f = jax.jit(lambda ro, rd: traverse_wide(arrays, dyn.wide_rows, wd, ro, rd))
pack_f = jax.jit(lambda ro, rd: tpk.traverse_packet(arrays, tables, ro, rd))
print('--- coherent primaries ---')
hw = bench('wide  ', wide_f, ro, rd)
hp = bench('packet', pack_f, ro, rd)
agree = (np.asarray(hw.intersected) == np.asarray(hp.intersected)).mean()
both = np.asarray(hw.intersected) & np.asarray(hp.intersected)
tok = np.allclose(np.asarray(hw.t)[both], np.asarray(hp.t)[both], rtol=1e-5, atol=1e-5)
print('   parity: intersected', agree, 't allclose', tok)
print('--- incoherent ---')
bench('wide  ', wide_f, ro2, rd2)
bench('packet', pack_f, ro2, rd2)
