"""Profiling & debugging utilities (the aux-subsystem analogue, SURVEY §5.1-2).

The reference profiles with ``MemoryProfilerHook``/``IterTimerHook`` and
offline benchmark classes; races/NaNs are unchecked. TPU-native equivalents:

  * ``trace(dir)`` — ``jax.profiler`` trace context (device events, not host
    wall clock) viewable in TensorBoard/xprof.
  * ``enable_nan_checks()`` — ``jax.debug_nans`` (the checkloss-hook analogue;
    the Runner additionally hard-fails on non-finite losses).
  * ``device_memory_stats()`` — per-device HBM usage (MemoryProfilerHook
    analogue).
  * ``StepTimer`` — smoothed it/s with warmup skip (LogProcessor analogue).
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                k: v for k, v in stats.items()
                if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
            }
    return out


class StepTimer:
    def __init__(self, window: int = 50, warmup: int = 2):
        self._times = deque(maxlen=window)
        self._warmup = warmup
        self._count = 0
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        self._count += 1
        if self._last is not None and self._count > self._warmup:
            self._times.append(now - self._last)
        self._last = now

    @property
    def steps_per_sec(self) -> float:
        if not self._times:
            return 0.0
        return len(self._times) / sum(self._times)
