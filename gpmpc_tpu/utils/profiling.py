"""Tracing / profiling helpers [SURVEY §5 'tracing/profiling'].

The reference's observability is wall-clock prints around IPOPT calls; here
the closed loop is one device program, so profiling means (a) XLA traces
via ``jax.profiler`` (TensorBoard-viewable) and (b) K-slope timing that
cancels fixed dispatch costs (essential on the axon tunnel, which adds an
erratic per-call floor — see benchmarks/detail_bench.py).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace of the enclosed block:

        with profiling.trace("/tmp/gpmpc_trace"):
            mpc.solve(...)

    View with TensorBoard's profile plugin.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, reps: int = 10, warmup: int = 1):
    """min/median wall seconds of ``fn(*args)`` with device sync."""
    import numpy as np
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), float(np.median(ts))


def slope_time(run_with_length, k1: int, k2: int, reps: int = 5):
    """Per-iteration seconds via the K-slope of a length-parameterized run —
    immune to fixed per-call dispatch overhead."""
    def best(k):
        jax.block_until_ready(run_with_length(k))
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run_with_length(k))
            b = min(b, time.perf_counter() - t0)
        return b
    return (best(k2) - best(k1)) / (k2 - k1)
