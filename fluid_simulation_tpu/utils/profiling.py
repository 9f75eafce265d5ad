"""Profiling hooks: wall-clock timers and jax.profiler traces.

The reference has no profiling at all (SURVEY.md §5) — greenfield. ``Timer``
blocks until device work completes so measured intervals are honest, and
``trace_ctx`` wraps ``jax.profiler.trace`` for Perfetto/XProf captures.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class Timer:
    """Context manager measuring wall time with device sync at both edges."""

    def __init__(self, sync_on=None):
        self._sync_on = sync_on
        self.seconds = None

    def __enter__(self):
        jax.effects_barrier()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync_on is not None:
            jax.block_until_ready(self._sync_on)
        self.seconds = time.perf_counter() - self._t0


@contextlib.contextmanager
def trace_ctx(log_dir: Optional[str]):
    """``with trace_ctx('/tmp/trace'): ...`` captures an XProf trace; no-op
    when log_dir is falsy."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
