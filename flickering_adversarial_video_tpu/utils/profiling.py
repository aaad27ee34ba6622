"""Profiling hooks (SURVEY.md section 5.1: the reference's only profiler is a
commented-out ProfilerHook; here tracing is first-class).

Usage:
    with trace_steps("/tmp/trace"):
        for _ in range(20):
            state, m = engine.train_step(...)
    # then: tensorboard --logdir /tmp/trace  (profile plugin)
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace_steps(log_dir: str) -> Iterator[None]:
    """jax.profiler trace around a block of device work."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Lightweight wall-clock section timer."""

    def __init__(self):
        self.sections = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.sections[name] = self.sections.get(name, 0.0) + time.perf_counter() - t0
