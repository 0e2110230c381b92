"""Tracing / profiling utilities.

The reference has only wall-clock bookkeeping (SURVEY.md §5.1); the TPU
equivalents here are first-class: ``jax.profiler`` trace capture for
XPlane/Perfetto inspection, annotated trace spans, and a timing helper
that blocks on device results (so numbers mean device time, not dispatch).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/vbn_tpu_trace"):
    """Capture a jax.profiler trace around a block (view with XProf/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span that shows up inside profiler traces."""
    return jax.profiler.TraceAnnotation(name)


def timed_call(fn, *args, **kwargs):
    """(result, ms) with block_until_ready on array outputs.

    Parity: ``benchmarking/utils.py:292`` ``timed_call``, made
    device-accurate.
    """
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) * 1000.0


class StageTimer:
    """Accumulate per-stage wall-clock ms across repeated calls."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            ms = (time.perf_counter() - t0) * 1000.0
            self.totals[name] = self.totals.get(name, 0.0) + ms
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_ms": self.totals[name],
                "calls": self.counts[name],
                "mean_ms": self.totals[name] / self.counts[name],
            }
            for name in self.totals
        }
