"""Per-op device-time breakdown of the INTERACTIVE frame (the bench.py
frames_device config: sibenik 640x480, 1 spp, depth 2, NEE, no guiding,
display transform fused) via jax.profiler xplane traces.

Usage: PYTHONPATH=/root/repo python tools/interactive_profile.py [K]
"""
import glob
import gzip
import json
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
from cuda_pathtracer_tpu.models.pathtracer import render_sample, tile_unpermute
from cuda_pathtracer_tpu.models import film
from cuda_pathtracer_tpu.models.guiding import init_radiance_state

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4

scene = get_scene('sibenik', asset_dirs=['/root/reference', '.'])
arrays, dyn = scene.to_device(), scene.dynamic_arrays()
cam = Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
iw, ih = 640, 480
radiance = init_radiance_state(int(arrays.tri_mat.shape[0]))
wd = -(-scene.wide_depth // 4) * 4
bn_np = np.asarray(arrays.blue_noise)
_lanes = np.arange(iw * ih)
_tpr = iw // 16
_g, _wl = _lanes // 128, _lanes % 128
bn_lanes = jnp.asarray(bn_np[((_g // _tpr) * 8 + _wl // 16) % bn_np.shape[0],
                             ((_g % _tpr) * 16 + _wl % 16) % bn_np.shape[1]])


@jax.jit
def frames_device(rand0):
    def one(i, carry):
        rand_idx, _ = carry
        l0, a0 = film.clear_accumulators(iw * ih)
        l1, a1, _, ridx, _ = render_sample(
            arrays, dyn, cam, radiance, l0, a0,
            jnp.uint32(0), rand_idx, jnp.asarray(False), bn_lanes,
            nee=True, cache_on=False, max_bounces=2,
            width=iw, height=ih, wide_depth=wd, tile_order=True,
            guide_off=True)
        l1 = tile_unpermute(l1, iw, ih)
        a1 = tile_unpermute(a1, iw, ih)
        img = film.display(l1, a1, 1.0, iw, ih, blur=False)
        return ridx, img
    return jax.lax.fori_loop(0, K, one, (rand0, jnp.zeros(
        (ih, iw, 3), jnp.float32)))


if os.environ.get('VMEM_KIB'):
    # per-jit compiler option (XLA_FLAGS is parsed locally and rejects
    # libtpu flags under the axon tunnel — see scoped_vmem_engine_ab.py)
    comp = frames_device.lower(jnp.uint32(3)).compile(compiler_options={
        'xla_tpu_scoped_vmem_limit_kib': os.environ['VMEM_KIB']})
    frames_device = comp
    print(f'# scoped vmem limit {os.environ["VMEM_KIB"]} KiB')

for w in range(2):
    r = frames_device(jnp.uint32(3 + w))
    r[1].block_until_ready()

if os.environ.get('DUMP_HLO'):
    if os.environ.get('VMEM_KIB'):
        txt = frames_device.as_text()
    else:
        txt = jax.jit(frames_device).lower(jnp.uint32(3)).compile().as_text()
    open('/tmp/interactive_hlo.txt', 'w').write(txt)
    print(f'# wrote /tmp/interactive_hlo.txt ({len(txt)} bytes)')

trace_dir = '/tmp/jaxtrace_int'
os.system(f'rm -rf {trace_dir}')
jax.profiler.start_trace(trace_dir)
t0 = time.perf_counter()
r = frames_device(jnp.uint32(11))
r[1].block_until_ready()
_ = np.asarray(r[1][:1, :1])
wall = time.perf_counter() - t0
jax.profiler.stop_trace()
print(f'wall (incl. RTT): {wall*1e3:.1f} ms for {K} frames '
      f'= {wall*1e3/K:.1f} ms/frame')

paths = sorted(glob.glob(f'{trace_dir}/**/*.trace.json.gz', recursive=True))
assert paths, f'no chrome trace under {trace_dir}'
evs = json.load(gzip.open(paths[-1], 'rt'))['traceEvents']
dev_pid = None
ops_tid = None
for e in evs:
    if e.get('ph') == 'M' and e.get('name') == 'process_name' \
            and 'TPU' in e['args'].get('name', ''):
        dev_pid = e['pid']
for e in evs:
    if e.get('ph') == 'M' and e.get('name') == 'thread_name' \
            and e.get('pid') == dev_pid \
            and e['args'].get('name') == 'XLA Ops':
        ops_tid = e['tid']
rows = [e for e in evs if e.get('ph') == 'X' and e.get('pid') == dev_pid
        and e.get('tid') == ops_tid]
rows.sort(key=lambda e: (e['ts'], -e['dur']))
stack = []
self_us = defaultdict(float)
count = defaultdict(int)
for e in rows:
    ts, dur, name = e['ts'], e['dur'], e['name']
    while stack and ts >= stack[-1][0] + stack[-1][1]:
        stack.pop()
    if stack:
        self_us[stack[-1][2]] -= dur
    self_us[name] += dur
    count[name] += 1
    stack.append((ts, dur, name))
total = sum(self_us.values())
print(f'device total (self): {total/1e3:.1f} ms for {K} frames '
      f'= {total/1e3/K:.2f} ms/frame across {len(self_us)} ops')


def categorize(name):
    n = name.lower()
    if '_run_packets' in n or 'custom' in n or 'mosaic' in n:
        return 'pallas-kernels'
    if 'sort' in n:
        return 'sort'
    if 'scatter' in n or 'dynamic-update' in n:
        return 'scatter'
    if 'fusion' in n:
        return 'fusion'
    if 'copy' in n or 'bitcast' in n or 'transpose' in n:
        return 'copy/layout'
    if 'while' in n or 'condition' in n or 'body' in n:
        return 'while-ctl'
    if 'reduce' in n:
        return 'reduce'
    return 'other'


cat_us = defaultdict(float)
for name, us in self_us.items():
    cat_us[categorize(name)] += us

print('\n-- by category (self time, per frame) --')
for cat, us in sorted(cat_us.items(), key=lambda kv: -kv[1]):
    print(f'{cat:20s} {us/1e3/K:9.2f} ms  {100*us/max(total,1):5.1f}%')

print('\n-- top 30 ops (self time/frame, count) --')
for name, us in sorted(self_us.items(), key=lambda kv: -kv[1])[:30]:
    print(f'{us/1e3/K:9.3f} ms  x{count[name]:4d}  {name[:110]}')

print('\n-- pallas kernel calls (individual durations, first frame) --')
seen = defaultdict(int)
for e in rows:
    if '_run_packets' in e['name'] and seen[e['name']] < 4:
        seen[e['name']] += 1
        print(f"  {e['name']:24s} call {seen[e['name']]}: "
              f"{e['dur']/1e3:7.2f} ms")
