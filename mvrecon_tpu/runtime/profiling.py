"""Profiling / tracing hooks.

The reference's only observability is per-iteration prints (SURVEY.md §5).
Here: named trace annotations around pipeline stages (visible in Perfetto /
TensorBoard traces via ``jax.profiler``) and a tiny wall-clock stage timer
for quick CLI reporting.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace_span(name: str) -> Iterator[None]:
    """Named span in the device trace (jax.profiler.TraceAnnotation) —
    wrap pipeline stages so profiles show calibrate/factorize/ba phases."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture_trace(log_dir: str) -> Iterator[None]:
    """Capture a full device trace to ``log_dir`` (open with TensorBoard
    or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Host-side wall-clock per stage; blocks on the result to attribute
    device time honestly."""

    def __init__(self):
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        yield
        self.times[name] = time.perf_counter() - start

    def block_and_time(self, name: str, value):
        start = time.perf_counter()
        value = jax.block_until_ready(value)
        self.times[name] = time.perf_counter() - start
        return value

    def summary(self) -> str:
        return ", ".join(f"{k}: {v:.3f}s" for k, v in self.times.items())
