"""Tracing / profiling hooks (SURVEY.md §5.1 — the reference has only ETA
arithmetic; here: jax.profiler traces + a steady-state step timer).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/segmif_trace"):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step wall-clock stats; call .tick() once per step."""

    def __init__(self, window: int = 100):
        self.window = window
        self._times: list = []
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
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
    def mean(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self.mean if self.mean else 0.0


def benchmark_fn(fn: Callable, *args, iters: int = 10,
                 warmup: int = 2) -> float:
    """Mean seconds/call of a jitted fn, forcing a host sync per call (the
    only reliable barrier through remote-execution tunnels)."""
    import jax.numpy as jnp

    def run():
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(leaf, dtype=jnp.float32))

    for _ in range(warmup):
        run()
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    return (time.perf_counter() - t0) / iters
