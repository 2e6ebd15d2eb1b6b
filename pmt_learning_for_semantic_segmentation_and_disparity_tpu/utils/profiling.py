"""Profiling hooks.

The reference has no tracing at all — wall-clock prints every 5 iters
(SURVEY.md §5). Here: jax.profiler integration (trace files viewable in
TensorBoard / Perfetto) plus a tiny step timer.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


def start_profiler_server(port: int = 9999) -> None:
    """On-demand profiling endpoint (connect with TensorBoard)."""
    jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace for the enclosed steps."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-time statistics (replaces the reference's raw
    time.time() prints, torch_implementation.py:346-379)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._last: Optional[float] = None
        self._count = 0

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                self.times.append(now - self._last)
        self._last = now

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    def throughput(self, batch: int) -> float:
        return batch / self.mean if self.mean > 0 else 0.0
