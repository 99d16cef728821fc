"""Profiling/tracing hooks (SURVEY §5 aux subsystem).

The reference's only instrumentation is wall-clock prints; the TPU-native
equivalents are ``jax.profiler`` traces plus a simple step timer that the
trainer uses for steps/s / tok/s reporting.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Context manager: capture a jax.profiler trace into ``logdir``.

    No-op when logdir is None or the profiler is unavailable, so callers can
    wrap hot loops unconditionally.
    """
    if not logdir:
        yield
        return
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class StepTimer:
    """Running steps/s and tok/s over a sliding window of host timestamps.

    ``tick(n_steps)`` records that n_steps completed since the last tick, so
    the trainer can tick once per sync point (every 20 steps) instead of
    per step — per-step host timing would only measure async dispatch.
    """

    def __init__(self, tokens_per_step: int, window: int = 100):
        self.tokens_per_step = tokens_per_step
        self.window = window
        self._stamps = [(time.perf_counter(), 0)]
        self._total = 0

    def tick(self, n_steps: int = 1) -> None:
        self._total += n_steps
        self._stamps.append((time.perf_counter(), self._total))
        if len(self._stamps) > self.window + 1:
            self._stamps.pop(0)

    @property
    def steps_per_sec(self) -> float:
        if len(self._stamps) < 2:
            return 0.0
        dt = self._stamps[-1][0] - self._stamps[0][0]
        ds = self._stamps[-1][1] - self._stamps[0][1]
        return ds / max(dt, 1e-9)

    @property
    def tokens_per_sec(self) -> float:
        return self.steps_per_sec * self.tokens_per_step
