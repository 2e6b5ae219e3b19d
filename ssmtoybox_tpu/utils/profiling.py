"""Tracing / profiling utilities.

The reference has no profiling support beyond ad-hoc ``time.time()`` prints in
research scripts (SURVEY §5.1, ``bsq_ungm.py:130-138``).  TPU-native
equivalents: a ``jax.profiler`` trace context for on-device timelines and a
robust wall-clock timer that forces completion through a scalar fetch (plain
``block_until_ready`` can return early through remote-device tunnels).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["trace", "timeit", "sync"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/Perfetto.

    >>> with trace('/tmp/jax-trace'):
    ...     run_study()
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> float:
    """Force execution to completion; returns a checksum of the outputs."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "dtype")]
    return float(sum(jnp.sum(jnp.abs(leaf.astype(jnp.float32))) for leaf in leaves))


def timeit(fn: Callable, *args, repeats: int = 3, warmup: int = 1):
    """Median steady-state wall-clock of ``fn(*args)`` with forced completion.

    Returns ``(seconds, last_output)``.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
        sync(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], out
