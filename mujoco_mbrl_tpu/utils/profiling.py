"""Profiling: jax.profiler traces + phase timers.

Fills the tracing gap noted in SURVEY §5 (the reference had only ad-hoc
timers): `trace(logdir)` captures a TensorBoard-viewable device trace;
`PhaseTimer` aggregates wall-clock per named phase of the MBRL loop.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Aggregating wall-clock timer for loop phases.

        timer = PhaseTimer()
        with timer.phase('collect'):
            ...
        timer.summary() -> {'collect': {'total': ..., 'count': ...}}
    """

    def __init__(self):
        self._total: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync: bool = False) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                # Block on any pending device work so timings are honest.
                (jax.device_put(0.0) + 0).block_until_ready()
            self._total[name] += time.perf_counter() - t0
            self._count[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {'total_s': self._total[k], 'count': self._count[k],
                    'mean_s': self._total[k] / max(self._count[k], 1)}
                for k in self._total}
