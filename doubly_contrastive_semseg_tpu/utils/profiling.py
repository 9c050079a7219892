"""Profiling / tracing subsystem.

The reference's observability is wall-clock meters only (SURVEY §5:
``TimeAverageMeter`` brackets, no profiler). TPU-native equivalents:

- ``StepTimer``: wall-clock step timing with a device fence (on remote
  backends ``block_until_ready`` can ack at dispatch; fetching a scalar is
  the reliable fence — see bench.py);
- ``trace``: context manager around ``jax.profiler`` producing a TensorBoard
  trace directory (``tensorboard --logdir <dir>`` → Profile tab);
- ``annotate``: named trace regions (``jax.profiler.TraceAnnotation``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


class StepTimer:
    """Rolling stats of fenced step times."""

    def __init__(self, skip_first: int = 1):
        self.skip_first = skip_first
        self.times: list = []
        self._seen = 0

    @contextlib.contextmanager
    def measure(self, fence_array=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if fence_array is not None:
            import jax

            jax.device_get(fence_array.ravel()[0])
        dt = time.perf_counter() - t0
        self._seen += 1
        if self._seen > self.skip_first:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    def report(self, per: int = 1) -> str:
        return f"{self.mean / per * 1000:.2f} ms" if self.times else "n/a"


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace (open in TensorBoard's Profile tab)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)
