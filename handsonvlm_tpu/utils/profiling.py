"""Profiling: jax.profiler trace capture + per-step timing hooks.

The reference has only wall-clock meters (SURVEY.md §5 "Tracing/profiling:
none"); here tracing is first-class: a context manager around any region
writes an XPlane trace viewable in TensorBoard/Perfetto, and StepTimer
produces steady-state steps/sec excluding compilation.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    """Profiler server for on-demand capture (TensorBoard 'capture profile')."""
    return jax.profiler.start_server(port)


class StepTimer:
    """Steady-state step timing: skips the first `warmup` steps (compile),
    reports steps/sec and a rolling mean."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self.total += dt

    @property
    def steady_steps(self) -> int:
        return max(self.count - self.warmup, 0)

    @property
    def sec_per_step(self) -> float:
        return self.total / self.steady_steps if self.steady_steps else float("nan")

    @property
    def steps_per_sec(self) -> float:
        s = self.sec_per_step
        return 1.0 / s if s == s and s > 0 else float("nan")

    def summary(self) -> Dict[str, float]:
        return {
            "steps": float(self.count),
            "sec_per_step": self.sec_per_step,
            "steps_per_sec": self.steps_per_sec,
        }
