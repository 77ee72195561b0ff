"""Find the ~1us/packet-step overhead: (a) while vs fixed fori, (b) B scaling,
(c) strip scratch updates."""
import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
import jax.lax as lax
import cuda_pathtracer_tpu.ops.traverse_packet as tpk
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.core import camera as cam_mod
from cuda_pathtracer_tpu.ops import intersect as isect

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
rop, rdp = np.asarray(ro[perm]), np.asarray(rd[perm])

def run_case(name, Bsub, fori_n=None):
    roj = jnp.asarray(rop[:Bsub]); rdj = jnp.asarray(rdp[:Bsub])
    if fori_n is not None:
        real_while = lax.while_loop
        def fixed_while(cond, body, init):
            return lax.fori_loop(0, fori_n, lambda i, c: body(c), init)
        lax.while_loop = fixed_while
    try:
        tpk._run_packets.clear_cache()
        f = jax.jit(lambda a, b: tpk.traverse_packet(arrays, tables, a, b))
        out = f(roj, rdj); _ = np.asarray(out.t[:4])
        best = 1e9
        for _ in range(4):
            s = time.perf_counter(); out = f(roj, rdj); _ = np.asarray(out.t[:4])
            best = min(best, time.perf_counter() - s)
        print(f'{name}: {best*1e3:8.2f} ms  {Bsub/best/1e6:7.2f} Mrays/s')
    finally:
        if fori_n is not None:
            lax.while_loop = real_while

run_case('while B=368640', 368640)
run_case('while B=36864 ', 36864)
run_case('while B=2560  ', 2560)
run_case('fori28 B=368640', 368640, fori_n=28)
run_case('fori14 B=368640', 368640, fori_n=14)
run_case('fori1  B=368640', 368640, fori_n=1)
