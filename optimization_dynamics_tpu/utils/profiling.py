"""Profiling hooks.

The reference's observability is ad-hoc ``@time``/BenchmarkTools
(SURVEY.md §5); here the native tools are XLA traces viewable in
TensorBoard/Perfetto plus the timing harness in utils/benchmark.py, and
``PhaseTimer`` — a per-phase wall-time accumulator the segmented
executor accepts directly (``make_segmented_solver(..., timers=...)``)
so phase breakdowns never need to poke at closure internals
(scripts/segmented_profile.py uses it for the on-chip latency budget).
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "annotate", "PhaseTimer"]


class PhaseTimer:
    """Accumulates wall time per named phase with device barriers.

    ``wrap(name, fn)`` returns ``fn`` instrumented with a
    ``block_until_ready`` barrier, so the recorded time is true device
    wall time including dispatch — exactly what a latency budget needs.
    The barrier makes phases synchronous; only use while profiling.
    """

    def __init__(self):
        self.times: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    def wrap(self, name: str, fn):
        def run(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            return out
        return run

    def report(self, total_s: float | None = None) -> dict:
        """Phase table sorted by cost; with ``total_s`` also reports the
        unattributed residual (host logic + dispatch gaps)."""
        out = {
            "phases_s": {k: round(v, 3) for k, v in sorted(
                self.times.items(), key=lambda kv: -kv[1])},
            "phase_calls": dict(self.counts),
            "phase_mean_ms": {
                k: round(1e3 * v / max(self.counts.get(k, 1), 1), 1)
                for k, v in self.times.items()},
        }
        if total_s is not None:
            out["total_wall_s"] = round(total_s, 3)
            out["host_and_dispatch_s"] = round(
                total_s - sum(self.times.values()), 3)
        return out


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
