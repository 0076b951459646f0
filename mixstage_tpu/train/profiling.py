"""Tracing / profiling subsystem.

The reference has none (SURVEY.md §5 — closest artifacts are tqdm loss strings
and an unused nvidia-smi parser, trainer.py:473-477).  The rebuild makes
observability first-class:

* ``StepTimer`` — per-step wall-time percentiles + throughput, reported into
  the epoch metrics dict;
* ``trace`` — a context manager around ``jax.profiler`` emitting a TensorBoard
  trace for a bounded window of steps (``-profile_dir`` flag).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


class StepTimer:
    """Wall-clock stats for train steps (device-async aware: call ``stop``
    after blocking on the step output for exact timing, or use it unblocked
    for dispatch-side throughput)."""

    def __init__(self, name: str = "step"):
        self.name = name
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
            self._t0 = None

    @contextlib.contextmanager
    def measure(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    def summary(self, prefix: str = "") -> Dict[str, float]:
        if not self.times:
            return {}
        t = np.asarray(self.times)
        return {f"{prefix}{self.name}_ms_p50": float(np.median(t) * 1e3),
                f"{prefix}{self.name}_ms_p99": float(np.percentile(t, 99) * 1e3),
                f"{prefix}{self.name}_per_sec": float(1.0 / np.mean(t))}

    def reset(self):
        self.times = []


@contextlib.contextmanager
def trace(profile_dir: Optional[str]):
    """jax.profiler trace when a directory is configured; no-op otherwise."""
    if not profile_dir:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(profile_dir)
    except Exception as e:  # profiler may be unsupported on tunneled backends
        print(f"profiler trace unavailable: {e}")
        yield
        return
    try:
        yield
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass
