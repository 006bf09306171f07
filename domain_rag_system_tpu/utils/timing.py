"""Wall-clock timing utilities.

The reference records only a per-query ``time.time()`` delta
(``evaluation/comprehensive_evaluation.py:312,328``). Here timing is a
first-class utility: per-stage accumulation (encode / dense / sparse /
fuse / rerank) so the evaluation harness and the profiler agree on where
time goes.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Dict, Iterator


@dataclass
class Timer:
    """Simple start/stop timer usable as a context manager."""

    elapsed: float = 0.0
    _t0: float = field(default=0.0, repr=False)

    def __enter__(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.elapsed = time.perf_counter() - self._t0


@dataclass
class StageTimer:
    """Accumulates wall-clock time per named stage across many queries."""

    totals: Dict[str, float] = field(default_factory=lambda: defaultdict(float))
    counts: Dict[str, int] = field(default_factory=lambda: defaultdict(int))

    @contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def mean(self, name: str) -> float:
        n = self.counts.get(name, 0)
        return self.totals[name] / n if n else 0.0

    def summary(self) -> Dict[str, Dict[str, float]]:
        # snapshot first: summary() may be read from another thread (the
        # server's /healthz) while a stage inserts a new key
        totals = dict(self.totals)
        counts = dict(self.counts)
        return {
            name: {
                "total_s": total,
                "count": counts.get(name, 0),
                "mean_s": total / counts[name] if counts.get(name) else 0.0,
            }
            for name, total in sorted(totals.items())
        }
