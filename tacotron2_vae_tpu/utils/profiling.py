"""Profiling and tracing (SURVEY §5 aux subsystem).

The reference only wall-clocks each iteration (train.py:207,234-238); here we
keep that `duration` scalar (training/train.py) and add real profiler
support: ``trace(logdir)`` captures an XLA/TPU trace viewable in
TensorBoard's profile plugin or Perfetto.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed block.

    >>> with trace("/tmp/profile"):
    ...     train_step(...)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with an EMA, for throughput reporting."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema = None
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.last = dt
        self.ema = dt if self.ema is None else (
            self.alpha * dt + (1 - self.alpha) * self.ema
        )
        return False

    def throughput(self, items: int) -> float:
        """items/sec based on the EMA step time."""
        return items / self.ema if self.ema else float("nan")
