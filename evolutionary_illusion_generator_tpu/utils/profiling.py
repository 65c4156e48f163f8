"""Tracing / profiling hooks.

The reference has no profiling at all (SURVEY.md §5: wall-progress prints
only).  Here: named phase timers aggregated per generation, plus a
``jax.profiler`` trace context that dumps a perfetto-compatible trace
directory for the device program.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax

__all__ = ["PhaseTimers", "trace"]


class PhaseTimers:
    """Accumulates named wall-clock phases; ``summary()`` -> {name: seconds}."""

    def __init__(self) -> None:
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

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """``jax.profiler`` trace into ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
