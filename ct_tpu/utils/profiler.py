"""Profiling / tracing utilities.

The reference only has wall-clock tic/toc timing (/root/reference/utils/
timer.py) around detect/NMS in the eval loop. The TPU-native equivalents:

  * ``trace(logdir)`` — capture a ``jax.profiler`` device trace viewable in
    TensorBoard/Perfetto (op-level timeline incl. Pallas kernels, DMA and
    collectives);
  * ``annotate(name)`` — ``TraceAnnotation`` context to label host spans
    inside a capture;
  * ``StepTimer`` — feeds smoothed per-step wall times into the metric
    storage (rate + ETA come from the CommonMetricPrinter).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed block."""
    import jax.profiler

    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a host-side span inside an active trace."""
    import jax.profiler

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Per-step wall-clock timing with warmup skip (compile steps excluded
    from the average)."""

    def __init__(self, skip_first: int = 2):
        self.skip_first = skip_first
        self._seen = 0
        self._last: Optional[float] = None
        self.total = 0.0
        self.count = 0

    def tick(self) -> Optional[float]:
        """Call once per step; returns this step's duration (or None)."""
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._seen += 1
            if self._seen > self.skip_first:
                self.total += dt
                self.count += 1
        self._last = now
        return dt

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)
