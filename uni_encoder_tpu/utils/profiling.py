"""Profiling hooks.

Capability spec: SURVEY.md §5 (tracing/profiling) — the reference has wall-
clock throughput and fvcore FLOP counting only; the TPU equivalent adds
jax.profiler traces (viewable in TensorBoard/XProf/Perfetto) plus simple
section timers.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with trace('/tmp/trace'): run_steps()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Section wall-clock aggregation (blocks on device results)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for k in sorted(self.totals, key=lambda k: -self.totals[k]):
            mean = self.totals[k] / max(self.counts[k], 1)
            lines.append(f"{k:40s} total {self.totals[k]:8.3f}s  mean {mean*1e3:8.2f}ms  n={self.counts[k]}")
        return "\n".join(lines)


def annotate(name: str):
    """Named trace annotation decorator for jitted functions."""
    return jax.named_scope(name)
