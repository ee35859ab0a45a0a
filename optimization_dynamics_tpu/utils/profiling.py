"""Profiling hooks.

The reference's observability is ad-hoc ``@time``/BenchmarkTools
(SURVEY.md §5); here the native tools are XLA traces viewable in
TensorBoard/Perfetto plus the timing harness in utils/benchmark.py.
"""

from __future__ import annotations

import contextlib

import jax

__all__ = ["trace", "annotate"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace:

    >>> with trace("/tmp/odx_trace"):
    ...     jax.block_until_ready(run(batch))
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)
