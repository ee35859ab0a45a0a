"""Phase-level wall-time breakdown of the segmented bench solve.

Runs the exact bench headline configuration (bench.py
``variant_segmented_fused``) with a ``utils.profiling.PhaseTimer``
threaded through ``make_segmented_solver`` — every jitted phase program
gets a ``block_until_ready`` barrier, so the report says where a full
batched cartpole-friction solve actually spends its time:

  - open-loop rollout (warm)
  - inner iteration, quick 2-alpha line search (derivative sweep +
    Riccati backward + (lane x 2-alpha) closed-loop rollout)
  - inner iteration, full Armijo grid (fallback)
  - k-chunk inner scan when iters_per_dispatch > 1
  - AL round bookkeeping (violation + dual update)
  - host<->device dispatch overhead (residual of total - sum(phases))

This feeds the distance-to-north-star account in BASELINE.md (the
reference has no analog: its solve is one single-trajectory Julia loop,
/root/reference/examples/cartpole.jl:100).

Usage (single-tenant TPU -- never concurrent with another TPU job):
  ODX_PROFILE_TPU=1 PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/segmented_profile.py [B]

Env knobs: ODX_BENCH_K (iters_per_dispatch), ODX_BENCH_PALLAS_RICCATI,
ODX_PROFILE_XLA_TRACE=<dir> additionally captures a jax.profiler device
trace of the timed solve (viewable in Perfetto/TensorBoard).

Without ODX_PROFILE_TPU=1 the script pins itself to CPU so an absent-
minded invocation can never contend for the single-tenant chip.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import os
import sys
import time

if os.environ.get("ODX_PROFILE_TPU", "") != "1":
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: shared builders)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    jax, on_tpu = bench._setup_jax()
    import jax.numpy as jnp

    from optimization_dynamics_tpu.solver.ilqr_segmented import (
        make_segmented_solver)
    from optimization_dynamics_tpu.utils.profiling import PhaseTimer, trace

    dtype = jnp.float32 if on_tpu else jnp.float64
    prob, x0, us0, opts = bench._build(on_tpu, dtype, fused=True)
    k = int(os.environ.get("ODX_BENCH_K", "1"))
    if os.environ.get("ODX_BENCH_PALLAS_RICCATI", "0") == "1":
        opts = dataclasses.replace(opts, pallas_riccati=on_tpu)
    if not on_tpu:
        B = 8
    x0s = bench._x0s(jax, jnp, x0, B, dtype)

    timers = PhaseTimer()
    stall = int(os.environ.get("ODX_BENCH_STALL_ROUNDS", "1"))
    sched_env = os.environ.get("ODX_BENCH_ALSCHED", "15,15,25,25,30")
    sched = (None if sched_env in ("", "none")
             else [int(s) for s in sched_env.split(",")])
    solve = make_segmented_solver(prob, opts, B, dtype=dtype,
                                  iters_per_dispatch=k, timers=timers,
                                  max_iter_schedule=sched,
                                  al_stall_rounds=stall)
    # first call: compile everything (cached to .jax_cache)
    res = solve(x0s, us0.astype(dtype))
    jax.block_until_ready(res.xs)
    timers.times.clear()
    timers.counts.clear()

    trace_dir = os.environ.get("ODX_PROFILE_XLA_TRACE", "")
    ctx = trace(trace_dir) if trace_dir else contextlib.nullcontext()
    t0 = time.perf_counter()
    with ctx:
        res = solve(x0s, us0.astype(dtype))
        jax.block_until_ready(res.xs)
    total = time.perf_counter() - t0

    n_conv = int(jnp.sum(res.converged))
    report = {
        "B": B,
        "k": k,
        "pallas_riccati": bool(opts.pallas_riccati),
        "backend": jax.default_backend(),
        "converged": f"{n_conv}/{B}",
        "converged_solves_per_s": round(n_conv / total, 3),
        "mean_inner_iters": round(float(jnp.mean(res.iterations)), 1),
    }
    report.update(timers.report(total_s=total))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
