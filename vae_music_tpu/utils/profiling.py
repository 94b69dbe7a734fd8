"""Profiling & debugging helpers.

The reference has no profiler (SURVEY.md §5 'Tracing/profiling: None').  TPU
equivalents provided here:
  * ``trace(profile_dir)`` — jax.profiler trace context (Perfetto-compatible)
  * ``timed`` — wall-clock timing that FORCES remote completion via a scalar
    fetch (block_until_ready is unreliable over tunneled TPU backends)
  * ``enable_nan_checks`` — jax debug_nans, the analogue of the reference's
    NaN-prevention clip at VectorQuantizer.py:141-144.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(profile_dir: str):
    """Capture a jax.profiler trace viewable in Perfetto/TensorBoard."""
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_completion(tree) -> float:
    """Block until a pytree of device arrays has actually been computed.

    Fetches a scalar reduction of one leaf to the host — reliable even on
    backends where block_until_ready returns early.
    """
    leaves = jax.tree_util.tree_leaves(tree)
    total = 0.0
    for leaf in leaves[-1:]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.number):
            total = float(jnp.sum(leaf))
    return total


_RTT_CACHE: list = []


def measure_rtt() -> float:
    """Host<->device round-trip cost of ONE scalar fetch (tunneled TPU
    backends pay ~28 ms per fetch regardless of device work).  Every timing
    loop must amortize this over many queued executions AND subtract it, or
    sub-RTT workloads measure the tunnel, not the chip.  Cached per process.
    """
    if _RTT_CACHE:
        return _RTT_CACHE[0]
    null = jax.jit(lambda v: v + 1.0)
    x = null(jnp.float32(0))
    _ = float(x)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _ = float(null(x))
        best = min(best, time.time() - t0)
    _RTT_CACHE.append(best)
    return best


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 1,
          **kwargs) -> Tuple[float, object]:
    """Returns (seconds_per_call, last_result): queues ``iters`` executions,
    forces completion once, subtracts the measured per-fetch RTT."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    force_completion(out)
    rtt = measure_rtt()
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    force_completion(out)
    # Floor at 0: work cheaper than the RTT jitter (e.g. iters=1 on the
    # tunneled backend) must not report a negative per-call time.
    return max(time.time() - t0 - rtt, 0.0) / iters, out


def enable_nan_checks(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
