"""Lightweight timer registry + device trace annotations.

TPU analog of the reference's `TimerOutputs.@timeit_debug` hooks (SURVEY.md
C17): host-side phases aggregate into a process-wide registry; traced code
regions are annotated for the JAX profiler via `jax.named_scope` so they show
up in XLA traces.  Disabled by default — zero overhead unless enabled, like
the reference's debug timers.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

_ENABLED = False
_TIMES: dict = defaultdict(lambda: [0.0, 0])


def enable(flag: bool = True) -> None:
    global _ENABLED
    _ENABLED = flag


def reset() -> None:
    _TIMES.clear()


def report() -> dict:
    """{section: (total_seconds, ncalls)}"""
    return {k: tuple(v) for k, v in _TIMES.items()}


@contextlib.contextmanager
def timeit(name: str):
    """Time a host-side section and annotate the device trace."""
    if not _ENABLED:
        with jax.named_scope(name):
            yield
        return
    t0 = time.perf_counter()
    try:
        with jax.named_scope(name):
            yield
    finally:
        rec = _TIMES[name]
        rec[0] += time.perf_counter() - t0
        rec[1] += 1
