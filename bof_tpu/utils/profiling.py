"""Profiling hooks.

The reference's tracing is log-based Timers around hot paths (SURVEY §5);
the TPU-native equivalent is the JAX/xprof profiler plus the Metrics
counter stream.  `trace()` wraps a region in a jax.profiler trace that
xprof/TensorBoard can open; it degrades to a plain Timer when the
profiler is unavailable (e.g. CPU test mesh).
"""
from __future__ import annotations

import contextlib
import os

from .logger import LOG
from .timer import Timer


@contextlib.contextmanager
def trace(name: str, log_dir: str | None = None):
    """Profile a region: `with trace("gemm", "/tmp/xprof"):` produces an
    xprof trace; without log_dir it just logs wall time."""
    t = Timer()
    if log_dir:
        import jax
        os.makedirs(log_dir, exist_ok=True)
        with jax.profiler.trace(log_dir):
            with jax.profiler.TraceAnnotation(name):
                yield
    else:
        yield
    LOG.debug("trace[%s]: %.1f ms", name, t.elapsed_ms())


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside an active profiler trace."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
