"""Profiling / timing utilities.

The reference's only tool is an unused wall-clock ``Timer``
(``utils_common.py:502-511``).  Here:

- :class:`Timer`: context manager with ``block_until_ready`` semantics so it
  measures device work, not dispatch;
- :func:`trace`: context manager around ``jax.profiler`` writing a TensorBoard
  trace;
- :func:`time_fn`: median-of-N timing helper used by benchmarks.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


class Timer:
    """with Timer("step") as t: ... ; t.elapsed holds seconds."""

    def __init__(self, msg: str = "", verbose: bool = True):
        self.msg = msg
        self.verbose = verbose
        self.elapsed = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        if self.verbose and self.msg:
            print(f"[timer] {self.msg}: {self.elapsed*1e3:.3f} ms")
        return False


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 2) -> float:
    """Median wall time per call (seconds), blocking on the result."""
    import numpy as np

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))
