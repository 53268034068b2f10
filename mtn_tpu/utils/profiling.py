"""Profiling + debug hooks (SURVEY.md §5: tracing/sanitizers).

The reference only logs wall-clock tokens/sec (train.py:43-48). Here:
- ``trace(logdir)``: jax.profiler trace context (view in TensorBoard);
- ``step_annotation``: names train/decode steps in the trace;
- ``enable_nan_checks`` / ``checkify_fn``: debug-mode NaN/OOB detection
  (the reference has no sanitizers; single-threaded torch).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_annotation(name: str, step: int):
    return jax.profiler.StepTraceAnnotation(name, step_num=step)


def enable_nan_checks(enable: bool = True):
    """Global NaN debugging (recompiles jitted fns with checks)."""
    jax.config.update("jax_debug_nans", enable)


def checkify_fn(fn: Callable, jit: bool = True):
    """Wrap a jittable fn with checkify float checks (NaN/inf/OOB).

    The checkified fn is jitted internally; the error is raised host-side
    after each call — so do NOT wrap the result in jax.jit again.
    """
    from jax.experimental import checkify
    checked = checkify.checkify(fn, errors=checkify.float_checks)
    if jit:
        checked = jax.jit(checked)

    def wrapper(*args, **kw):
        err, out = checked(*args, **kw)
        err.throw()
        return out

    return wrapper


class Timer:
    def __init__(self):
        self.start = time.time()

    def elapsed(self) -> float:
        return time.time() - self.start

    def reset(self) -> float:
        now = time.time()
        dt = now - self.start
        self.start = now
        return dt
