"""Profiling and debugging toggles.

The reference's only observability was wall-clock progress prints
(SURVEY.md §5.1-2). Here: ``jax.profiler`` trace capture around any run
(viewable in TensorBoard/Perfetto), named trace annotations for the
optimizer phases, and NaN-debugging toggles (the functional design removes
the reference's non-reentrant-closure hazard class entirely;
``closure.py:29-30``).
"""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for everything inside the block:

        with profiling.trace("/tmp/p2l_trace"):
            opt.optimize(...)
    """
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield
    print(f"profiler trace written to {log_dir} "
          "(view with TensorBoard or ui.perfetto.dev)")


def annotate(name: str):
    """Named annotation visible in profiler timelines:

        with profiling.annotate("cma-generation"):
            ...
    """
    return jax.profiler.TraceAnnotation(name)


def debug_nans(enable: bool = True):
    """Re-run jitted programs op-by-op to pinpoint NaN producers."""
    jax.config.update("jax_debug_nans", bool(enable))


def log_compiles(enable: bool = True):
    """Print every XLA compilation (to catch accidental retraces)."""
    jax.config.update("jax_log_compiles", bool(enable))
