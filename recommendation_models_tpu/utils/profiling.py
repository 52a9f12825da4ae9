"""Tracing/profiling hooks (SURVEY.md §5).

`trace_sweeps` wraps a training region in `jax.profiler.trace` so sweeps land
in TensorBoard (tensorboard-plugin-profile); `Timer` provides the wall-clock
+ rows-solved/sec/chip counters that form the headline metric.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace_sweeps(logdir: Optional[str]) -> Iterator[None]:
    """Profile the enclosed sweeps into `logdir` (no-op when logdir is None)."""
    if not logdir:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


class Timer:
    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        return False

    def rows_per_sec(self, n_rows: int, n_chips: int = 1) -> float:
        return n_rows / self.elapsed / max(n_chips, 1)


__all__ = ["trace_sweeps", "Timer"]
