"""Tracing / profiling helpers (SURVEY §5.1: the reference has none —
first-class here).

- ``trace(logdir)``: context manager around ``jax.profiler`` producing a
  TensorBoard-loadable XLA trace of everything inside.
- ``StepTimer``: wall-clock step latency accumulator with p50/p95/p99,
  for real-time-budget validation (the reference's implied budget is one
  replan per h = 100 ms).
- ``annotate(name)``: TraceAnnotation wrapper so custom phases show up in
  the trace viewer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import numpy as np
import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA/host trace under ``logdir`` (view with TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates wall-clock latencies; reports percentiles.

    Use around a blocking step:
        with timer.measure():
            jax.block_until_ready(step(...))
    """

    def __init__(self):
        self.samples: List[float] = []

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        self.samples.append(time.perf_counter() - t0)

    def stats(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        s = np.asarray(self.samples)
        return {
            "n": int(s.size),
            "mean_ms": float(s.mean() * 1e3),
            "p50_ms": float(np.percentile(s, 50) * 1e3),
            "p95_ms": float(np.percentile(s, 95) * 1e3),
            "p99_ms": float(np.percentile(s, 99) * 1e3),
            "max_ms": float(s.max() * 1e3),
        }
