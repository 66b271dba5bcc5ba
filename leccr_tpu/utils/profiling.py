"""Tracing/profiling hooks.

The reference's only observability is wall-clock prints and CUDA max-memory
meters (SURVEY.md §5 — utils/__init__.py:150-172).  Here:
- `trace_context` wraps a region in a jax.profiler trace (view in
  TensorBoard / Perfetto) with named step annotations;
- `step_timer` is a lightweight wall-clock/step-rate tracker that also
  reports device memory highwater from the backend allocator stats.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace_context(logdir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into `logdir` (no-op when None)."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class step_timer:
    """Accumulates step wall-times; `rate()` = steps/s, `summary()` includes
    device peak memory when the backend exposes allocator stats."""

    def __init__(self) -> None:
        self.times = []
        self._last = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    def rate(self) -> float:
        if not self.times:
            return 0.0
        return len(self.times) / sum(self.times)

    def summary(self) -> dict:
        from leccr_tpu.train.metrics import device_memory_mb

        return {
            "steps": len(self.times),
            "steps_per_sec": self.rate(),
            "mean_step_s": (sum(self.times) / len(self.times)
                            if self.times else 0.0),
            "peak_device_mb": device_memory_mb(),
        }
