"""Tracing / profiling subsystem (SURVEY.md §5: the reference has none
beyond ad-hoc timers; here it is first-class).

- :class:`PhaseTimer`: lightweight wall-clock accumulators per pipeline
  phase (motion-filter, frontend-update, dba, backend, ...), with
  device-sync points so timings are honest under async dispatch.
- :func:`trace`: context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import jax


class PhaseTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        """Time a phase; pass an array in ``sync`` to block on it."""
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> dict:
        return {
            k: {"total_s": round(self.totals[k], 4),
                "count": self.counts[k],
                "mean_ms": round(1e3 * self.totals[k] / max(self.counts[k], 1), 3)}
            for k in sorted(self.totals)
        }

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/lgu_trace"):
    """jax.profiler trace for TensorBoard / xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
