"""Wall-clock tic/toc timing with running averages.

Capability parity with ``Timer`` (/root/reference/utils/timer.py:11-40),
used by the eval harness to report per-image detect/NMS time.
"""

from __future__ import annotations

import time


class Timer:
    def __init__(self):
        self.clear()

    def clear(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0
        self.average_time = 0.0

    def tic(self):
        self.start_time = time.perf_counter()

    def toc(self, average: bool = True) -> float:
        self.diff = time.perf_counter() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        self.average_time = self.total_time / self.calls
        return self.average_time if average else self.diff
