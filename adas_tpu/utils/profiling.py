"""Tracing / profiling: per-stage timers, rolling FPS, jax.profiler hooks.

The reference's observability is wall-clock timers around each model call
and a 30-frame FPS window drawn on the HUD (demo.py:84-99, 268-281).
This module packages the same counters for reuse plus real profiler
integration: ``device_trace`` wraps a region in a ``jax.profiler`` trace
(TensorBoard-viewable), and ``StageTimers`` aggregates p50/p95 per stage.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional

import numpy as np


class FPSCounter:
    """Rolling N-frame FPS (reference demo.py:84-99 semantics)."""

    def __init__(self, window: int = 30):
        self.window = window
        self.fps = 0.0
        self._count = 0
        self._start = time.time()

    def tick(self) -> float:
        self._count += 1
        if self._count >= self.window:
            now = time.time()
            self.fps = self._count / (now - self._start)
            self._count = 0
            self._start = now
        return self.fps


class StageTimers:
    """Named wall-clock stage timers with percentile summaries."""

    def __init__(self, keep: int = 1000):
        self.keep = keep
        self._samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            samples = self._samples[name]
            samples.append(time.perf_counter() - t0)
            if len(samples) > self.keep:
                del samples[: len(samples) - self.keep]

    def last(self, name: str) -> float:
        s = self._samples.get(name)
        return s[-1] if s else 0.0

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, s in self._samples.items():
            arr = np.asarray(s)
            out[name] = {
                "n": len(arr),
                "mean_ms": float(arr.mean() * 1000),
                "p50_ms": float(np.percentile(arr, 50) * 1000),
                "p95_ms": float(np.percentile(arr, 95) * 1000),
            }
        return out


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler device trace around the region (no-op when
    ``log_dir`` is None so callers can leave the hook in place)."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named sub-region inside a device trace (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
