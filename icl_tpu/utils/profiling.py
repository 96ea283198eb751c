"""Profiling/tracing hooks (SURVEY.md §5: the reference has none — its
`--throughput` flag and fp/bp benchmark helpers are dead code
(net_factory.py:58-59, networks_other.py:203-258). Here: jax.profiler
traces + step timing as first-class utilities)."""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock throughput meter with warmup exclusion."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup_steps = warmup_steps
        self._count = 0
        self._t0 = None

    def tick(self) -> None:
        self._count += 1
        if self._count == self.warmup_steps:
            self._t0 = time.perf_counter()

    @property
    def steps_per_sec(self) -> float:
        if self._t0 is None or self._count <= self.warmup_steps:
            return 0.0
        return (self._count - self.warmup_steps) / (time.perf_counter() - self._t0)
