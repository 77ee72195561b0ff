"""Per-op device-time breakdown of one converge sample (render_sample at one
1080p band) via jax.profiler xplane traces. Groups HLO ops by category so the
engine's cost structure is visible without guessing from ablation deltas
(which carry the ~30-60 ms tunnel RTT each).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_op_profile.py
       [max_bounces]
"""
import glob
import os
import sys
import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(__file__) + '/..')

from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.core.camera import Camera
from cuda_pathtracer_tpu.models.pathtracer import render_sample
from cuda_pathtracer_tpu.models import film
from cuda_pathtracer_tpu.models.guiding import init_radiance_state

MB = int(sys.argv[1]) if len(sys.argv) > 1 else 32

scene = get_scene('sibenik', asset_dirs=['/root/reference', '.'])
arrays, dyn = scene.to_device(), scene.dynamic_arrays()
cam = Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
W, H = 1920, 216
B = W * H
radiance = init_radiance_state(int(arrays.tri_mat.shape[0]))
lum, alb = film.clear_accumulators(B)
wd = -(-scene.wide_depth // 4) * 4


def frame():
    return render_sample(arrays, dyn, cam, radiance, lum, alb,
                         jnp.uint32(1), jnp.uint32(7), jnp.asarray(True),
                         nee=True, cache_on=True, max_bounces=MB,
                         width=W, height=H, full_height=1080,
                         wide_depth=wd, tile_order=True)


out = frame()
out[0].block_until_ready()
_ = np.asarray(out[0][:1])

trace_dir = '/tmp/jaxtrace'
os.system(f'rm -rf {trace_dir}')
jax.profiler.start_trace(trace_dir)
t0 = time.perf_counter()
out = frame()
out[0].block_until_ready()
_ = np.asarray(out[0][:1])
wall = time.perf_counter() - t0
jax.profiler.stop_trace()
print(f'wall (incl. RTT): {wall*1e3:.1f} ms')

# ---- parse the xplane ----
from tensorboard_plugin_profile.protobuf import xplane_pb2  # noqa: E402

paths = glob.glob(f'{trace_dir}/**/*.xplane.pb', recursive=True)
assert paths, f'no xplane under {trace_dir}'
xs = xplane_pb2.XSpace()
with open(paths[0], 'rb') as f:
    xs.ParseFromString(f.read())

cat_ns = defaultdict(int)
op_ns = defaultdict(int)
total_ns = 0
for plane in xs.planes:
    pname = plane.name
    if 'TPU' not in pname and 'tpu' not in pname and '/device' not in pname:
        continue
    ev_meta = plane.event_metadata
    for line in plane.lines:
        lname = line.name.lower()
        if 'step' in lname:
            continue
        for ev in line.events:
            name = ev_meta[ev.metadata_id].name
            dur = ev.duration_ps // 1000   # ns
            op_ns[name] += dur
            total_ns += dur

print(f'device total: {total_ns/1e6:.1f} ms across {len(op_ns)} op names '
      f'(plane sum; overlapping lines may double-count)')


def categorize(name):
    n = name.lower()
    if 'custom-call' in n or 'tpu_custom_call' in n or 'mosaic' in n:
        return 'pallas-kernels'
    if 'sort' in n:
        return 'sort'
    if 'gather' in n or 'dynamic-slice' in n:
        return 'gather/slice'
    if 'scatter' in n or 'dynamic-update' in n:
        return 'scatter'
    if 'while' in n:
        return 'while-overhead'
    if 'fusion' in n:
        return 'fusion'
    if 'copy' in n or 'bitcast' in n or 'transpose' in n or 'reshape' in n:
        return 'copy/layout'
    if 'convert' in n or 'broadcast' in n or 'iota' in n:
        return 'elementwise-misc'
    if 'reduce' in n:
        return 'reduce'
    if 'all-reduce' in n or 'collective' in n:
        return 'collective'
    return 'other'


for name, ns in op_ns.items():
    cat_ns[categorize(name)] += ns

print('\n-- by category --')
for cat, ns in sorted(cat_ns.items(), key=lambda kv: -kv[1]):
    print(f'{cat:20s} {ns/1e6:9.2f} ms  {100*ns/max(total_ns,1):5.1f}%')

print('\n-- top 25 ops --')
for name, ns in sorted(op_ns.items(), key=lambda kv: -kv[1])[:25]:
    print(f'{ns/1e6:9.2f} ms  {name[:110]}')
