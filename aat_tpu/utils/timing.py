"""Timing + profiling helpers.

- :class:`RecordTimings` — the reference ships a broken version
  (src/aat/training/timings_metrics.py:5-14, ``__enter__`` takes arguments
  Python never passes); this is the working equivalent: a reusable context
  manager accumulating wall-clock per named section into a metrics dict.
- :func:`profile_trace` — jax.profiler trace context (the TPU-native
  replacement for the reference's cProfile wrapper,
  scripts/trainer_train.py:353-360); view with TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict


class RecordTimings:
    """Usage::

        timings: Dict[str, float] = {}
        with RecordTimings(timings, "collate"):
            ...
    """

    def __init__(self, metrics: Dict[str, float], key: str):
        self.metrics = metrics
        self.key = key

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        elapsed = time.perf_counter() - self._start
        self.metrics[self.key] = self.metrics.get(self.key, 0.0) + elapsed
        return False


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/aat_tpu_trace"):
    """XLA/TPU profiler trace around a code region."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
