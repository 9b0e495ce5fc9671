"""First-class timing/profiling (SURVEY.md §5: the reference only has
wall-clock pairs in generate_model_samples.py; here step-time and
throughput counters plus jax.profiler trace hooks are a module).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class StepTimer:
    """Tracks step wall-times and derived throughput.

    Call mark() once per step; stats() gives mean/min step time and
    items/sec over the recorded window (first `warmup` marks dropped —
    they include compilation).
    """

    def __init__(self, items_per_step: int = 0, warmup: int = 1):
        self.items_per_step = items_per_step
        self.warmup = warmup
        self._times = []
        self._last = None

    def mark(self):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
        self._last = now

    @property
    def steps(self) -> int:
        return len(self._times)

    def stats(self) -> Dict[str, float]:
        times = self._times[self.warmup:] or self._times
        if not times:
            return {}
        mean = sum(times) / len(times)
        out = {
            "step_time_mean_s": mean,
            "step_time_min_s": min(times),
            "steps_per_sec": 1.0 / mean,
        }
        if self.items_per_step:
            out["items_per_sec"] = self.items_per_step / mean
        return out


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def wall_clock():
    """Yields a dict filled with {'seconds': ...} on exit."""
    out = {}
    start = time.perf_counter()
    try:
        yield out
    finally:
        out["seconds"] = time.perf_counter() - start
