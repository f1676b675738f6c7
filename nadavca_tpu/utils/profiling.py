"""Profiling hooks (SURVEY.md §5 "Tracing / profiling" row).

The reference has none; the rebuild exposes jax.profiler traces (viewable in
Perfetto/XProf) behind a context manager and a CLI flag, plus lightweight
wall-clock stage timers that feed utils.metrics.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(trace_dir: Optional[str]):
    """jax.profiler trace of the enclosed block when trace_dir is set."""
    if not trace_dir:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates wall-clock per named stage; reports into a Metrics object."""

    def __init__(self, metrics=None):
        self.totals = {}
        self.metrics = metrics

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            if self.metrics is not None:
                self.metrics.gauge(f"stage_{name}_s", self.totals[name])
