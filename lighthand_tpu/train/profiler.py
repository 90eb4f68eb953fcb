"""Profiling / step-timing hooks.

The reference's only perf instrumentation is wall-clock batch timing via an
AverageMeter feeding an ETA bar (SURVEY.md section 5.1). Here:

- ``StepTimer``: SMA batch-time + images/sec (the BENCH north-star metric),
  measured natively in the loop;
- ``trace()``: a context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of the XLA execution for any window of steps.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque

import jax


class StepTimer:
    def __init__(self, window: int = 50):
        self._dt = deque(maxlen=window)
        self._last = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._dt.append(now - self._last)
        self._last = now

    @property
    def avg_step_seconds(self) -> float:
        return sum(self._dt) / len(self._dt) if self._dt else 0.0

    def images_per_sec(self, batch_size: int) -> float:
        dt = self.avg_step_seconds
        return batch_size / dt if dt > 0 else 0.0

    def eta_seconds(self, steps_remaining: int) -> float:
        return self.avg_step_seconds * steps_remaining


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA trace window: ``with trace(dir): run steps`` -> TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)
