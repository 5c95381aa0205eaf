"""Profiling helpers (reference ``mmdet/utils/profiling.py:12-40``
``profile_time`` CUDA-event context manager -> jax.profiler + host timing)."""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def profile_time(trace_name: str, name: str, enabled: bool = True, stream=None):
    """Wall-clock section timer that also annotates the XLA trace."""
    if not enabled:
        yield
        return
    with jax.profiler.TraceAnnotation(f"{trace_name}:{name}"):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = (time.perf_counter() - t0) * 1000
            print(f"{trace_name} {name} {dt:.2f} ms")


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TensorBoard-viewable device trace around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_and_time(fn, *args, iters: int = 10, warmup: int = 2):
    """Time a jitted callable (used by benchmark tools)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out
