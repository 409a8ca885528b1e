"""Tracing / profiling helpers.

The reference's only instrumentation is wall-clock prints inside one sampler
(mnist_samplers/ppde.py:56-70; SURVEY.md §5). Here:
  * ``trace(dir)`` — context manager capturing a jax.profiler trace
    (TensorBoard-viewable) around any run section;
  * ``timed_segments`` — per-segment wall times without host syncs inside
    segments (timing happens at natural segment boundaries);
  * ``annotate`` — named TraceAnnotation spans for custom regions.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with profiling.trace('/tmp/trace'): run()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class SegmentTimer:
    """Accumulates per-segment wall times; zero overhead inside segments."""

    def __init__(self):
        self.times: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    @property
    def total(self) -> float:
        return sum(self.times)

    def summary(self) -> str:
        if not self.times:
            return "no segments timed"
        import numpy as np

        t = np.asarray(self.times)
        return (f"{len(t)} segments: total {t.sum():.2f}s, "
                f"mean {t.mean()*1e3:.1f}ms, p50 {np.median(t)*1e3:.1f}ms, "
                f"max {t.max()*1e3:.1f}ms")
