"""Profiling hooks: jax.profiler traces + per-phase wall timers.

The reference only records per-iteration wall time
(gmmvi_runner.py:158-163).  Here the same ``walltime`` / ``algo_time``
metrics exist in the runner, plus:

* :func:`trace` — capture a jax.profiler trace of a code region (view with
  TensorBoard / xprof);
* :class:`PhaseTimers` — named accumulating wall timers for host-side phases.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimers:
    """Accumulating wall timers keyed by phase name."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return dict(self.totals)
