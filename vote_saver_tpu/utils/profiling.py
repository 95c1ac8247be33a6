"""Tracing/profiling: timers + throughput counters (+ JAX profiler hook).

The reference's only instrumentation is one wall-clock region around the
vote phase (main.cpp:449-456).  SURVEY.md §5 asks for per-kernel timing and
Mpoints/s / Mbutterflies/s counters — provided here, plus an optional
jax.profiler trace context for TPU timeline capture.
"""

from __future__ import annotations

import contextlib
import time

from .logging import log_metric


class Timer:
    """with Timer("vote_phase") as t: ...; t.ms afterwards."""

    def __init__(self, name: str, items: int | None = None, unit: str = "items"):
        self.name, self.items, self.unit = name, items, unit
        self.ms = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.ms = (time.perf_counter() - self._t0) * 1e3
        log_metric(f"{self.name}_ms", round(self.ms, 2))
        if self.items:
            rate = self.items / (self.ms / 1e3)
            log_metric(f"{self.name}_{self.unit}_per_s", round(rate, 2))
        return False

    @property
    def per_second(self) -> float:
        return (self.items or 0) / (self.ms / 1e3) if self.ms else 0.0


def mpoints_per_s(n_points: int, seconds: float) -> float:
    return n_points / seconds / 1e6


def mbutterflies_per_s(domain: int, seconds: float) -> float:
    return (domain // 2) * (domain.bit_length() - 1) / seconds / 1e6


@contextlib.contextmanager
def device_trace(path: str | None):
    """jax.profiler trace context (no-op when path is None)."""
    if path is None:
        yield
        return
    import jax

    with jax.profiler.trace(path):
        yield
