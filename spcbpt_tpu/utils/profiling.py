"""Tracing/profiling utilities (SURVEY.md §5 parity).

The reference has wall-clock section timers surfaced in an ImGui overlay
(optixPathTracer.cpp:787-817, sutil.cpp:715-752) and CUDA-event stage timers
for training (device_thrust.h:16-30). TPU equivalents: a phase timer with
block_until_ready fences, and an optional jax.profiler trace context for
xprof/tensorboard dumps.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulating per-phase wall timers with device fences.

    with timer.phase("light_trace", fence=result): ...
    print(timer.report())
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            if "fence" in holder:
                jax.block_until_ready(holder["fence"])
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name:>16}: {tot*1e3:9.1f} ms total, "
                         f"{tot/n*1e3:8.2f} ms/call x{n}")
        return "\n".join(lines)

    def as_dict(self):
        return {k: {"total_s": self.totals[k], "calls": self.counts[k]}
                for k in self.totals}


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
