"""Profiling helpers: XLA traces + per-step wall timing.

TPU-native replacement for the reference's observability hooks
(reference: src/misc/benchmarker.py + the IterationTimer callback,
src/main.py:42-48): `trace()` wraps a region in a `jax.profiler` trace that
can be opened in TensorBoard/XProf; `StepTimer` logs rolling step times.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from pathlib import Path


@contextmanager
def trace(log_dir: str | Path = "outputs/profile"):
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step wall-time tracker (wandb `time/step_time` analog)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._last: float | None = None

    def tick(self) -> float | None:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        return dt

    @property
    def mean(self) -> float | None:
        return sum(self._times) / len(self._times) if self._times else None

    @property
    def steps_per_s(self) -> float | None:
        m = self.mean
        return (1.0 / m) if m else None
