"""Profiling/tracing helpers: wall-clock brackets + jax.profiler traces.

The reference's observability is ``time.time()`` bracketing plus
``tf.name_scope`` labels (SURVEY.md §5); here the equivalents are a ``timed``
context manager (blocks on device completion, so timings are real) and a
``trace`` wrapper around ``jax.profiler.trace`` for TensorBoard-viewable
device profiles.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def timed(label: str = "", results: dict | None = None, sync=None):
    """Wall-clock bracket; blocks on ``sync`` (any pytree) before stopping
    the clock so asynchronous dispatch doesn't fake speed."""
    t0 = time.perf_counter()
    box = {}
    try:
        yield box
    finally:
        if box.get("sync") is not None:
            jax.block_until_ready(box["sync"])
        elif sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        box["seconds"] = dt
        if results is not None:
            results[label] = dt


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/pgps_trace"):
    """Device profiler trace viewable in TensorBoard/XProf."""
    with jax.profiler.trace(log_dir):
        yield log_dir
