"""Attribute the converge band-sample's XLA fusion mass to source ops.

Profiles ONE render_sample at the headline band config (1920x216, spp=2,
32 bounces, guiding on — the exact per-band program bench.py dispatches),
collects per-op device SELF time from the chrome trace, then maps each top
fusion to the jax op_names recorded in its HLO metadata. This names the
47% "fusion" bucket of BENCH_r04 so round 5 can attack components, not a
category.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/fusion_attrib.py
       [top_n]    (env: PROF_SPP=2 PROF_W/H/FULLH, PROF_MB)
"""
import glob
import gzip
import json
import os
import re
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

TOP_N = int(sys.argv[1]) if len(sys.argv) > 1 else 24
MB = int(os.environ.get('PROF_MB', '32'))
SPP = int(os.environ.get('PROF_SPP', '2'))
W = int(os.environ.get('PROF_W', '1920'))
H = int(os.environ.get('PROF_H', '216'))

scene = get_scene(os.environ.get('PROF_SCENE', 'sibenik'),
                  asset_dirs=['/root/reference', '.'])
arrays, dyn = scene.to_device(), scene.dynamic_arrays()
cam = Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
B = W * H
radiance = init_radiance_state(int(arrays.tri_mat.shape[0]))
lum, alb = film.clear_accumulators(B)
wd = -(-scene.wide_depth // 4) * 4


def frame():
    return render_sample(arrays, dyn, cam, radiance, lum, alb,
                         jnp.uint32(1), jnp.uint32(7), jnp.asarray(True),
                         nee=True, cache_on=True, max_bounces=MB,
                         width=W, height=H,
                         full_height=int(os.environ.get('PROF_FULLH', '1080')),
                         wide_depth=wd, tile_order=True, spp=SPP,
                         defer_guide=True)


jf = jax.jit(frame)
print('lowering/compiling...', flush=True)
compiled = jf.lower().compile()
hlo = compiled.as_text()
open('/tmp/fusion_attrib_hlo.txt', 'w').write(hlo)

out = jf()
out[0].block_until_ready()
_ = np.asarray(out[0][:1])

trace_dir = '/tmp/jaxtrace-fa'
import shutil
shutil.rmtree(trace_dir, ignore_errors=True)
jax.profiler.start_trace(trace_dir)
t0 = time.perf_counter()
out = jf()
out[0].block_until_ready()
_ = np.asarray(out[0][:1])
wall = time.perf_counter() - t0
jax.profiler.stop_trace()
print(f'wall (incl. RTT): {wall * 1e3:.1f} ms')

paths = sorted(glob.glob(f'{trace_dir}/**/*.trace.json.gz', recursive=True))
assert paths
evs = json.load(gzip.open(paths[-1], 'rt'))['traceEvents']
dev_pid = ops_tid = None
for e in evs:
    if e.get('ph') == 'M' and e.get('name') == 'process_name' \
            and 'TPU' in e['args'].get('name', ''):
        dev_pid = e['pid']
for e in evs:
    if e.get('ph') == 'M' and e.get('name') == 'thread_name' \
            and e.get('pid') == dev_pid and e['args'].get('name') == 'XLA Ops':
        ops_tid = e['tid']
rows = [e for e in evs if e.get('ph') == 'X' and e.get('pid') == dev_pid
        and e.get('tid') == ops_tid]
rows.sort(key=lambda e: (e['ts'], -e['dur']))
stack, self_us, count = [], defaultdict(float), defaultdict(int)
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
print(f'device total (self): {total / 1e3:.1f} ms across {len(self_us)} ops')

# ---- HLO attribution ------------------------------------------------------
# map: computation name -> {op_name prefix: count}; fusion instr -> its calls=
lines = hlo.splitlines()
fusion_calls = {}      # 'fusion.1620' -> computation name
fusion_shape = {}
for ln in lines:
    m = re.match(r'\s*(?:ROOT )?%?([\w.-]+) = (\S+) fusion\(', ln)
    if m and 'calls=' in ln:
        comp = ln.split('calls=')[1].split(',')[0].split(' ')[0].lstrip('%')
        fusion_calls[m.group(1)] = comp
        fusion_shape[m.group(1)] = m.group(2)

comp_ops = defaultdict(lambda: defaultdict(int))
cur_comp = None
for ln in lines:
    m = re.match(r'%?([\w.-]+)\s+\(.*\)\s+->', ln)
    if not ln.startswith(' ') and ('{' in ln):
        m2 = re.match(r'\s*(?:ENTRY )?%?([\w.-]+)', ln)
        if m2:
            cur_comp = m2.group(1)
    if cur_comp and 'metadata=' in ln:
        mm = re.search(r'op_name="([^"]+)"', ln)
        if mm:
            opn = mm.group(1)
            # keep the tail 2 path segments: the jaxpr eqn + its enclosing fn
            segs = opn.split('/')
            key = '/'.join(segs[-2:]) if len(segs) > 1 else opn
            comp_ops[cur_comp][key] += 1

top = sorted(self_us.items(), key=lambda kv: -kv[1])[:TOP_N]
for name, us in top:
    n = count[name]
    line = f'{name:32s} {us / 1e3:8.1f} ms x{n}'
    base = name.split(':')[0]
    if base in fusion_calls:
        comp = fusion_calls[base]
        ops = comp_ops.get(comp, {})
        top_ops = sorted(ops.items(), key=lambda kv: -kv[1])[:4]
        attrib = '; '.join(f'{k}({v})' for k, v in top_ops)
        line += f'  [{fusion_shape.get(base, "")}]  <- {attrib}'
    print(line)
