"""Profiling hooks: jax.profiler traces + step timing / throughput counters.

The reference has no tracing at all (SURVEY.md §5); here profiling is
first-class: wrap any region in trace_context() to capture an xplane trace
viewable in TensorBoard/XProf, and StepTimer maintains rolling scen/s and
edges/s counters.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace_context(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed region (no-op if
    log_dir is None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling-window throughput: scenarios/s and message-edges/s."""

    def __init__(self, window: int = 50):
        self.times: deque = deque(maxlen=window)
        self.scen: deque = deque(maxlen=window)
        self.edges: deque = deque(maxlen=window)
        self._last = None

    def tick(self, scenarios: int = 0, edges: int = 0):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            self.scen.append(scenarios)
            self.edges.append(edges)
        self._last = now

    @property
    def scen_per_s(self) -> float:
        dt = sum(self.times)
        return sum(self.scen) / dt if dt > 0 else 0.0

    @property
    def edges_per_s(self) -> float:
        dt = sum(self.times)
        return sum(self.edges) / dt if dt > 0 else 0.0

    @property
    def step_ms(self) -> float:
        return 1000.0 * sum(self.times) / len(self.times) if self.times else 0.0
