"""Per-op device-time breakdown of one converge sample (render_sample at one
1080p band) via jax.profiler xplane traces. Groups HLO ops by category so the
engine's cost structure is visible without guessing from ablation deltas
(which carry the ~30-60 ms tunnel RTT each).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_op_profile.py
       [max_bounces]   (env: PROF_SCENE=sibenik PROF_W=1920 PROF_H=216
        PROF_FULLH=1080 PROF_CAM=sibenik)
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

scene = get_scene(os.environ.get('PROF_SCENE', 'sibenik'),
                  asset_dirs=['/root/reference', '.'])
arrays, dyn = scene.to_device(), scene.dynamic_arrays()
if os.environ.get('PROF_CAM', 'sibenik') == 'sibenik':
    cam = Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
else:
    cam = Camera.create([0, 6, -8], [0, -0.05, 1], 1.5, 8.0, 0.0)
W = int(os.environ.get('PROF_W', '1920'))
H = int(os.environ.get('PROF_H', '216'))
B = W * H
radiance = init_radiance_state(int(arrays.tri_mat.shape[0]))
lum, alb = film.clear_accumulators(B)
wd = -(-scene.wide_depth // 4) * 4


CACHE = os.environ.get('PROF_CACHE', '1') != '0'
GUIDE = os.environ.get('PROF_GUIDE', '1') != '0'


def frame():
    return render_sample(arrays, dyn, cam, radiance, lum, alb,
                         jnp.uint32(1), jnp.uint32(7), jnp.asarray(GUIDE),
                         nee=True, cache_on=CACHE, max_bounces=MB,
                         width=W, height=H,
                         full_height=int(os.environ.get('PROF_FULLH', '1080')),
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

# ---- parse the chrome trace (self-time per op via interval nesting) ----
import gzip
import json

paths = sorted(glob.glob(f'{trace_dir}/**/*.trace.json.gz', recursive=True))
assert paths, f'no chrome trace under {trace_dir}'
evs = json.load(gzip.open(paths[-1], 'rt'))['traceEvents']
# pid of the TPU device, tid of "XLA Ops"
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
print(f'device total (self): {total/1e3:.1f} ms across {len(self_us)} ops')


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

print('\n-- by category (self time) --')
for cat, us in sorted(cat_us.items(), key=lambda kv: -kv[1]):
    print(f'{cat:20s} {us/1e3:9.2f} ms  {100*us/max(total,1):5.1f}%')

print('\n-- top 30 ops (self time, count) --')
for name, us in sorted(self_us.items(), key=lambda kv: -kv[1])[:30]:
    print(f'{us/1e3:9.2f} ms x{count[name]:4d}  {name[:100]}')

# ---- PROF_HLO=1: identify the hot fusions in the optimized HLO of the SAME
# executable (render_sample's own jit, so fusion numbering matches the trace)
if os.environ.get('PROF_HLO', '0') != '0':
    import re
    txt = render_sample.lower(
        arrays, dyn, cam, radiance, lum, alb,
        jnp.uint32(1), jnp.uint32(7), jnp.asarray(True),
        nee=True, cache_on=True, max_bounces=MB,
        width=W, height=H,
        full_height=int(os.environ.get('PROF_FULLH', '1080')),
        wide_depth=wd, tile_order=True).compile().as_text()
    open('/tmp/hlo_prof.txt', 'w').write(txt)
    # map computation name -> body text for op histograms
    comp_bodies = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r'%?([\w\.\-]+) \([^)]*\) -> ', line)
        if m:
            cur = m.group(1)
            comp_bodies[cur] = []
        elif cur is not None and line.startswith('  '):
            comp_bodies[cur].append(line)
    print('\n-- hot fusion identification --')
    for name, us in sorted(self_us.items(), key=lambda kv: -kv[1])[:25]:
        if 'fusion' not in name and 'sort' not in name \
                and 'reduce' not in name and 'copy' not in name \
                and 'scatter' not in name:
            continue
        m = re.search(r'%' + re.escape(name) + r' = ([^\n]*)', txt)
        if not m:
            continue
        line = m.group(1)
        shape = line.split(' ')[0]
        mm = re.search(r'op_name="([^"]*)"', line)
        src = re.search(r'source_file="([^"]*)".*source_line=(\d+)', line)
        print(f'\n{name}  ({us/1e3:.2f} ms x{count[name]})  {shape}')
        if mm:
            print(f'  op_name: {mm.group(1)[:160]}')
        if src:
            print(f'  source: {src.group(1)}:{src.group(2)}')
        cm = re.search(r'calls=%?([\w\.\-]+)', line)
        if cm and cm.group(1) in comp_bodies:
            hist = defaultdict(int)
            srcs = defaultdict(int)
            for bl in comp_bodies[cm.group(1)]:
                om = re.search(r'= [\w\[\],\{\} ]+? (\w[\w\-]*)\(', bl)
                if om:
                    hist[om.group(1)] += 1
                sm = re.search(r'source_file="([^"]*)".*source_line=(\d+)',
                               bl)
                if sm and '/cuda_pathtracer_tpu/' in sm.group(1):
                    short = sm.group(1).split('/cuda_pathtracer_tpu/')[-1]
                    srcs[f'{short}:{sm.group(2)}'] += 1
            body = ' '.join(f'{k}x{v}' for k, v in
                            sorted(hist.items(), key=lambda kv: -kv[1])[:10])
            print(f'  body: {body}')
            top_src = ' '.join(f'{k}({v})' for k, v in
                               sorted(srcs.items(),
                                      key=lambda kv: -kv[1])[:6])
            print(f'  lines: {top_src}')
