"""Tracing / profiling utilities.

The reference has no profiling beyond tqdm rolling averages (SURVEY.md §5);
here the engine exposes the TPU-native equivalents: ``jax.profiler`` traces
viewable in tensorboard/xprof, and host-side step timers tracking
clips/sec — the framework's north-star metric.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


class StepTimer:
    """EMA step timer + cumulative clips/sec counter."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.step_time: Optional[float] = None
        self.total_clips = 0
        self.total_time = 0.0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, n_clips: int) -> float:
        assert self._t0 is not None
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self.total_clips += n_clips
        self.total_time += dt
        self.step_time = (
            dt if self.step_time is None
            else self.ema * self.step_time + (1 - self.ema) * dt
        )
        return dt

    @property
    def clips_per_sec(self) -> float:
        return self.total_clips / max(self.total_time, 1e-9)


@contextlib.contextmanager
def maybe_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace into ``log_dir`` when set; no-op otherwise.

    The trace captures device timelines (MXU occupancy, HBM traffic, infeed
    stalls) viewable with tensorboard's profile plugin or xprof.
    """
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the profiler timeline (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
