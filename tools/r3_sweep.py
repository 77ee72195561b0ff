"""Round-3 chip-session sweep: run every queued on-chip A/B in one sitting.

The tunnel went down mid-round with several built-but-unpriced levers queued
(PERF.md round-3 section): the v2b batched shared-reduce kernel, the hybrid
VMEM-top/HBM-DMA split for 2mtris, the kernel_lab3 per-visit ablations
(incl. the new `mxu` matmul-reduce variant), and a HEAD re-bench. This
script runs them back-to-back the moment the tunnel returns, logging
everything to tools/r3_sweep_results.txt — one chip session, no idle gaps,
compile cache shared across steps.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/r3_sweep.py
       [step...]   steps: head lab3 v2b hybrid v2b_bench interactive
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, 'tools', 'r3_sweep_results.txt')
ENV_BASE = dict(os.environ,
                PYTHONPATH='/root/repo:/root/.axon_site',
                JAX_CACHE_DIR='/tmp/jaxcache')


def run(tag, args, env=None, timeout=3600):
    e = dict(ENV_BASE)
    if env:
        e.update(env)
    hdr = f'\n===== {tag} ===== {time.strftime("%H:%M:%S")} env={env or {}}\n'
    sys.stdout.write(hdr)
    sys.stdout.flush()
    with open(LOG, 'a') as f:
        f.write(hdr)
    try:
        r = subprocess.run([sys.executable] + args, env=e, cwd=REPO,
                           capture_output=True, text=True, timeout=timeout)
        out = r.stdout + ('\n--- stderr ---\n' + r.stderr if r.returncode
                          else '')
    except subprocess.TimeoutExpired:
        out = f'TIMEOUT after {timeout}s'
    sys.stdout.write(out[-4000:] + '\n')
    sys.stdout.flush()
    with open(LOG, 'a') as f:
        f.write(out + '\n')


STEPS = sys.argv[1:] or ['head', 'lab3', 'v2b', 'hybrid', 'interactive']

if 'head' in STEPS:
    # HEAD headline re-bench (last on-chip number was commit 1996460: 3.37)
    run('bench-head', ['bench.py'], env={'BENCH_SCENES': '0'})

if 'lab3' in STEPS:
    run('kernel_lab3', ['tools/kernel_lab3.py'])

if 'v2b' in STEPS:
    # batched shared-reduce kernel on real wavefronts, NPK 2 and 4
    run('multipush v2 vs v2b (NPK2=2)', ['tools/multipush_lab.py',
                                         'v2', 'v2b'])
    run('multipush v2 vs v2b (NPK2=4)', ['tools/multipush_lab.py',
                                         'v2', 'v2b'],
        env={'CPT_NPK2': '4'})

if 'hybrid' in STEPS:
    # 2mtris: pure-DMA vs hybrid split (VMEM-resident tree top)
    run('2mtris pure-DMA', ['tools/stress_bench.py', '2'],
        env={'CPT_HYBRID_ROWS': '0'})
    run('2mtris hybrid 150k', ['tools/stress_bench.py', '2'],
        env={'CPT_HYBRID_ROWS': '150000'})

if 'v2b_bench' in STEPS:
    # only worth running if the v2b step won in the lab
    run('bench CPT_V2B=1 NPK2=4', ['bench.py'],
        env={'BENCH_SCENES': '0', 'CPT_V2B': '1', 'CPT_NPK2': '4'})

if 'interactive' in STEPS:
    run('bench full (all scene rows)', ['bench.py'])
