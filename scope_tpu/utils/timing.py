"""Metrics + profiling.

Replaces the reference's half-wired instrumentation (SURVEY.md §5): CUDA
events appended to a never-initialized ``config.timer``
(llama_model.py:161-167, 209-213) and the TimingStreamer TTFT/TPOT capture
(run_longgenbench.py:67-78).  Here:

- :class:`MetricsRegistry` — a process-local registry of counters and
  latency series with percentile summaries and JSON export.
- :func:`xla_profile` — context manager around ``jax.profiler`` producing
  Perfetto-compatible traces (the TPU-native equivalent of per-layer CUDA
  event timing; per-op attribution comes from the trace viewer).
- :func:`timed_block` — host-side wall-clock timing around
  ``block_until_ready`` for step-level measurements.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Any, Dict, List, Optional

import numpy as np


class MetricsRegistry:
    def __init__(self):
        self.counters: Dict[str, float] = defaultdict(float)
        self.series: Dict[str, List[float]] = defaultdict(list)

    def incr(self, name: str, value: float = 1.0):
        self.counters[name] += value

    def observe(self, name: str, value: float):
        self.series[name].append(value)

    def summary(self) -> Dict[str, Any]:
        out: Dict[str, Any] = dict(self.counters)
        for name, vals in self.series.items():
            arr = np.asarray(vals)
            out[name] = {
                "count": int(arr.size),
                "mean": float(arr.mean()) if arr.size else None,
                "p50": float(np.percentile(arr, 50)) if arr.size else None,
                "p95": float(np.percentile(arr, 95)) if arr.size else None,
                "max": float(arr.max()) if arr.size else None,
            }
        return out

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


REGISTRY = MetricsRegistry()


@contextlib.contextmanager
def timed_block(name: str, registry: Optional[MetricsRegistry] = None,
                result=None):
    """Wall-clock a host-side block; blocks on ``result`` if given."""
    import jax
    reg = registry or REGISTRY
    t0 = time.perf_counter()
    yield
    if result is not None:
        jax.block_until_ready(result)
    reg.observe(name, time.perf_counter() - t0)


@contextlib.contextmanager
def xla_profile(log_dir: str):
    """Capture an XLA/TPU profile viewable in Perfetto/TensorBoard."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
