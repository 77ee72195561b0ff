"""Profiling and observability.

The reference's observability is printf: an FPS EMA every 60 ticks
(src/main.cpp:416-418) and BVH-build wall times (src/bvhBuilder.h:37,264).
This module provides the TPU equivalents: a stage timer with
block_until_ready fencing, the FPS EMA, and a hook into jax.profiler traces
for per-kernel analysis (SURVEY §5's prescribed replacement for nvprof).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulates wall time per named stage; device work is fenced so the
    numbers mean what they say."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, fence=None):
        t0 = time.perf_counter()
        yield
        if fence is not None:
            jax.block_until_ready(fence)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f'{name:30s} {tot * 1e3:9.1f} ms total '
                         f'({tot / n * 1e3:8.2f} ms x {n})')
        return '\n'.join(lines)


class FpsMeter:
    """The running-average FPS of main.cpp:416-418 (EMA 0.95/0.05)."""

    def __init__(self, report_every: int = 60):
        self.ema = 0.0
        self.tick = 0
        self.report_every = report_every
        self._last = None

    def frame(self) -> float | None:
        """Call once per frame; returns the EMA when it's time to report."""
        now = time.perf_counter()
        if self._last is not None:
            fps = 1.0 / max(now - self._last, 1e-9)
            self.ema = self.ema * 0.95 + 0.05 * fps
        self._last = now
        self.tick += 1
        if self.tick % self.report_every == 0:
            return self.ema
        return None


@contextlib.contextmanager
def device_trace(log_dir: str = '/tmp/jax-trace'):
    """jax.profiler trace for per-kernel timing (view with TensorBoard or
    xprof) — the nvprof/Nsight replacement."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _categorize_op(name: str) -> str:
    n = name.lower()
    if '_guide_scatter' in n:
        return 'guiding-scatter'
    if '_run_packets' in n or 'custom' in n or 'mosaic' in n:
        return 'traversal-kernels'
    if 'sort' in n:
        return 'sort'
    if 'scatter' in n or 'dynamic-update' in n:
        return 'scatter'
    if 'fusion' in n:
        return 'fusion'
    if 'copy' in n or 'bitcast' in n or 'transpose' in n:
        return 'copy/layout'
    if 'reduce' in n:
        return 'reduce'
    return 'other'


def device_op_shares(run, log_dir: str = '/tmp/jax-trace-shares'):
    """Run `run()` under a profiler trace and return {category: device ms}
    of XLA-op SELF time — the per-stage cost breakdown the reference reads
    off nvprof (its guiding share: 2.3% of frame, README.md:119-124).
    `run` must fence its own device work (block_until_ready + a tiny
    host transfer; this tunnel's block_until_ready can return early)."""
    import glob
    import gzip
    import json
    import shutil
    shutil.rmtree(log_dir, ignore_errors=True)
    jax.profiler.start_trace(log_dir)
    run()
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(f'{log_dir}/**/*.trace.json.gz', recursive=True))
    if not paths:
        return {}
    evs = json.load(gzip.open(paths[-1], 'rt'))['traceEvents']
    dev_pid = ops_tid = None
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
    stack, self_us = [], defaultdict(float)
    for e in rows:
        ts, dur, name = e['ts'], e['dur'], e['name']
        while stack and ts >= stack[-1][0] + stack[-1][1]:
            stack.pop()
        if stack:
            self_us[stack[-1][2]] -= dur
        self_us[name] += dur
        stack.append((ts, dur, name))
    cat_ms = defaultdict(float)
    for name, us in self_us.items():
        cat_ms[_categorize_op(name)] += us / 1e3
    top = sorted(self_us.items(), key=lambda kv: -kv[1])[:12]
    cat_ms['_top_ops'] = [(n, us / 1e3) for n, us in top]
    return dict(cat_ms)
