"""Profiling and tracing hooks (SURVEY §5.1 — the reference has none).

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of the wrapped region.
* :class:`StepTimer` — honest wall-clock step timing.  On the remote-TPU
  backend used here ``block_until_ready()`` can return before execution
  finishes, so ``StepTimer.stop(result)`` forces a small device->host fetch
  as the completion barrier (the same technique bench.py uses).
* :func:`named_scope` — re-export of ``jax.named_scope``; the layer engine
  wraps each layer's forward in one so traces show per-layer cost.
"""
from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax
import numpy as np

named_scope = jax.named_scope


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed region into ``log_dir``
    (view with TensorBoard's profile plugin or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def fetch_barrier(result) -> None:
    """Block until ``result`` (any pytree of arrays) has actually been
    computed, by fetching one element of one leaf."""
    leaves = jax.tree_util.tree_leaves(result)
    if leaves:
        np.asarray(leaves[0]).ravel()[:1]


class StepTimer:
    """Collects per-step wall times; ``summary()`` gives mean/min/p50."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._steps_seen = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            fetch_barrier(result)
        dt = time.perf_counter() - self._t0
        self._steps_seen += 1
        if self._steps_seen > self.warmup:
            self.times.append(dt)
        return dt

    @contextlib.contextmanager
    def step(self, result_holder=None):
        self.start()
        yield self
        self.stop()

    def summary(self) -> dict:
        if not self.times:
            return {"steps": 0}
        arr = np.asarray(self.times)
        return {
            "steps": int(arr.size),
            "mean_s": float(arr.mean()),
            "min_s": float(arr.min()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
        }


def roofline(edges: int, features: int, seconds: float, *,
             dtype_bytes: int = 4, hbm_gbps: float = 819.0) -> dict:
    """SpMM roofline estimate for one propagation (BASELINE north star:
    >=70% of the bandwidth bound).  Traffic model: each edge reads one
    source row (random), the output is written once."""
    bytes_moved = edges * features * dtype_bytes  # source-row reads
    bound_s = bytes_moved / (hbm_gbps * 1e9)
    return {
        "bytes_moved": bytes_moved,
        "bound_s": bound_s,
        "achieved_fraction": bound_s / seconds if seconds > 0 else 0.0,
        "edges_per_s": edges / seconds if seconds > 0 else 0.0,
    }
