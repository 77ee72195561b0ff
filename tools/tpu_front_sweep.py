"""Sweep CPT_PKF (traversal fronts) x CPT_PPC (packet sets per grid cell)
on real sibenik wavefronts. Each config runs in a subprocess because the
knobs are module-level constants baked at import.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_front_sweep.py
"""
import itertools
import os
import subprocess
import sys

BODY = r"""
import time
import numpy as np, jax, jnp_alias
"""

CHILD = r"""
import time
import numpy as np, jax
import jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.core import camera as cam_mod
from cuda_pathtracer_tpu.ops import traverse_packet as tpk

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
perm = jnp.asarray(np.arange(B).reshape(H//TH, TH, W//TW, TW)
                   .transpose(0, 2, 1, 3).reshape(-1))

pack_f = jax.jit(lambda a, b: tpk.traverse_packet(arrays, tables, a, b))
pack_any = jax.jit(lambda a, b, tm: tpk.traverse_packet(
    arrays, tables, a, b, t_max=tm, any_hit=True))

def bench(name, fn, *args, K=4):
    out = fn(*args)
    _ = np.asarray(out.t[:4])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(K)]
    for o_ in outs:
        o_.t.block_until_ready()
    dt = (time.perf_counter() - t0) / K
    print(f'  {name}: {dt*1e3:8.2f} ms  {B/dt/1e6:6.2f} Mrays/s', flush=True)

h1 = pack_f(ro[perm], rd[perm])
hitn = np.asarray(h1.t)
ron = np.asarray(ro[perm]); rdn = np.asarray(rd[perm])
hp = ron + rdn * (hitn[:, None] - 1e-3)
rng = np.random.default_rng(1)
d2 = rng.normal(size=(B, 3)).astype(np.float32)
d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
flip = (d2 * rdn).sum(1) > 0
d2[flip] = -d2[flip]
q = ((hp - hp.min(0)) / (np.ptp(hp, 0) + 1e-6) * 1023).astype(np.int64)
def spread(v):
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v
morton = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
oct_ = ((d2[:, 0] > 0).astype(np.int64)
        | ((d2[:, 1] > 0).astype(np.int64) << 1)
        | ((d2[:, 2] > 0).astype(np.int64) << 2))
om = jnp.asarray(np.argsort((morton << 3) | oct_, kind='stable'))
ro2 = jnp.asarray(hp); rd2 = jnp.asarray(d2)

light_p = np.array([-4.0, 8.0, 0.0], np.float32)
sd = light_p[None, :] - hp
dist = np.linalg.norm(sd, axis=1, keepdims=True)
sdn = sd / dist
tm3 = jnp.asarray(dist[:, 0] - 2e-3)

bench('primary', pack_f, ro[perm], rd[perm])
bench('bounce ', pack_f, ro2[om], rd2[om], K=2)
bench('shadow ', pack_any, jnp.asarray(hp), jnp.asarray(sdn), tm3)
"""

if __name__ == '__main__':
    configs = [(nf, ppc) for nf in (1, 2, 4) for ppc in (1, 8)]
    for nf, ppc in configs:
        env = dict(os.environ)
        env['CPT_PKF'] = str(nf)
        env['CPT_PPC'] = str(ppc)
        print(f'NF={nf} PPC={ppc}', flush=True)
        r = subprocess.run([sys.executable, '-c', CHILD], env=env,
                           capture_output=True, text=True, timeout=1800)
        out = [l for l in r.stdout.splitlines() if l.strip()]
        err = [l for l in r.stderr.splitlines()
               if 'WARNING' not in l and l.strip()][-3:]
        for l in out:
            print(l, flush=True)
        if r.returncode != 0:
            for l in err:
                print('  ERR', l, flush=True)
