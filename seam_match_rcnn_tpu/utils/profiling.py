"""Profiling hooks.

The reference has no structured profiling (SURVEY.md §5.1 — only iteration
timers and CUDA peak memory in log lines).  Here: ``jax.profiler`` trace
capture around any region plus per-step wall timing helpers; traces open in
TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named sub-region inside an active trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock per-phase accounting (data / compute / host)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}
