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
