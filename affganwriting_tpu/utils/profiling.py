"""Tracing / numerical-debug switches (SURVEY.md §5.1-§5.2).

The reference only has wall-clock timers; here:
  * ``trace(logdir)`` — a context manager around ``jax.profiler`` producing
    TensorBoard-viewable TPU traces of the enclosed steps;
  * ``step_timer`` — per-step wall time accumulator (sec_per_iter);
  * ``debug_numerics(True)`` — flips jax_debug_nans/infs, the jit-level
    analogue of torch's anomaly detection flag (base_trainer.py:196-197).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def debug_numerics(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)


class StepTimer:
    """sec/iter + iters/sec accumulator (base_trainer.py:212-231)."""

    def __init__(self):
        self.total = 0.0
        self.count = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.total += time.perf_counter() - self._t0
        self.count += 1
        return False

    @property
    def sec_per_iter(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def iters_per_sec(self) -> float:
        return self.count / max(self.total, 1e-9)
