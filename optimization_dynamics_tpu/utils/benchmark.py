"""Timing harness — the build's ``@benchmark`` equivalent.

The reference ends every example with a BenchmarkTools ``@benchmark``
block (e.g. /root/reference/examples/cartpole.jl:112-114); this module
provides the same capability for jitted solves, excluding compile time
and reporting robust statistics.
"""

from __future__ import annotations

import time
from typing import Callable, NamedTuple

import jax
import numpy as np

__all__ = ["BenchStats", "benchmark"]


class BenchStats(NamedTuple):
    mean_s: float
    median_s: float
    min_s: float
    max_s: float
    runs: int
    compile_s: float

    def __repr__(self):
        return (f"BenchStats(median {self.median_s * 1e3:.3f} ms, "
                f"min {self.min_s * 1e3:.3f} ms over {self.runs} runs; "
                f"compile {self.compile_s:.2f} s)")


def benchmark(fn: Callable, *args, runs: int = 10,
              warmup: int = 1) -> BenchStats:
    """Time a jittable ``fn(*args)``; blocks on all outputs."""
    jitted = jax.jit(fn)

    t0 = time.perf_counter()
    out = jitted(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    for _ in range(max(warmup - 1, 0)):
        jax.block_until_ready(jitted(*args))

    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        jax.block_until_ready(jitted(*args))
        times.append(time.perf_counter() - t0)
    t = np.asarray(times)
    return BenchStats(
        mean_s=float(t.mean()), median_s=float(np.median(t)),
        min_s=float(t.min()), max_s=float(t.max()),
        runs=runs, compile_s=compile_s)
