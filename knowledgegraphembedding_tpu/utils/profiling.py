"""Tracing / profiling hooks (SURVEY.md §5.1 — absent in the reference).

``trace(dir)`` wraps a code region in a jax.profiler trace (viewable in
TensorBoard / Perfetto); ``Throughput`` is the rolling triples/s meter the
train loop logs alongside the reference's loss averages.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Profile the enclosed region when log_dir is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """Annotate individual steps inside a trace (TraceAnnotation shows up
    as a named span on the TPU timeline)."""

    def __init__(self, name: str = "train_step"):
        self.name = name

    def __enter__(self):
        self._span = jax.profiler.TraceAnnotation(self.name)
        self._span.__enter__()
        return self

    def __exit__(self, *exc):
        return self._span.__exit__(*exc)


class Throughput:
    """Rolling triples/s meter."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n_steps: int = 1):
        self._steps += n_steps

    def rate(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._steps * self.batch_size / dt if dt > 0 else 0.0
