"""Phase-level wall-time breakdown of the segmented bench solve.

Runs the exact BENCH_r02 headline configuration (bench.py
``variant_segmented_fused``) but times each jitted phase program with a
``block_until_ready`` barrier after every dispatch, so the report says
where a full batched cartpole-friction solve actually spends its time:

  - open-loop rollout (warm)
  - inner iteration, quick 2-alpha line search (derivative sweep +
    Riccati backward + (lane x 2-alpha) closed-loop rollout)
  - inner iteration, full Armijo grid (fallback)
  - AL round bookkeeping (violation + dual update)
  - host<->device dispatch overhead (residual of total - sum(phases))

This feeds the distance-to-north-star account in BASELINE.md (the
reference has no analog: its solve is one single-trajectory Julia loop,
/root/reference/examples/cartpole.jl:100).

Usage (single-tenant TPU -- never concurrent with another TPU job):
  ODX_PROFILE_TPU=1 PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/segmented_profile.py [B]

Without ODX_PROFILE_TPU=1 the script pins itself to CPU so an absent-
minded invocation can never contend for the single-tenant chip.
"""

from __future__ import annotations

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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    jax, on_tpu = bench._setup_jax()
    import jax.numpy as jnp

    from optimization_dynamics_tpu.solver.ilqr_segmented import (
        make_segmented_solver)

    dtype = jnp.float32 if on_tpu else jnp.float64
    prob, x0, us0, opts = bench._build(on_tpu, dtype, fused=True)
    if not on_tpu:
        B = 8
    x0s = bench._x0s(jax, jnp, x0, B, dtype)

    times = {}
    counts = {}

    def timed(name, fn):
        def run(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            times[name] = times.get(name, 0.0) + dt
            counts[name] = counts.get(name, 0) + 1
            return out
        return run

    solve = make_segmented_solver(prob, opts, B, dtype=dtype)
    # first call: compile everything (cached to .jax_cache)
    res = solve(x0s, us0.astype(dtype))
    jax.block_until_ready(res.xs)

    # instrument the solver's jitted phases via its closure cells
    cells = {}
    for name, val in zip(solve.__code__.co_freevars,
                         solve.__closure__ or ()):
        cells[name] = val
    inner = cells["inner"].cell_contents
    icells = {}
    for name, val in zip(inner.__code__.co_freevars,
                         inner.__closure__ or ()):
        icells[name] = val
    icells["iter_j"].cell_contents = timed(
        "inner_full", icells["iter_j"].cell_contents)
    icells["iter_quick_j"].cell_contents = timed(
        "inner_quick", icells["iter_quick_j"].cell_contents)
    icells["traj_cost_j"].cell_contents = timed(
        "traj_cost", icells["traj_cost_j"].cell_contents)
    cells["rollout_j"].cell_contents = timed(
        "rollout_open", cells["rollout_j"].cell_contents)
    cells["al_round_j"].cell_contents = timed(
        "al_round", cells["al_round_j"].cell_contents)
    cells["finish_j"].cell_contents = timed(
        "finish", cells["finish_j"].cell_contents)

    t0 = time.perf_counter()
    res = solve(x0s, us0.astype(dtype))
    jax.block_until_ready(res.xs)
    total = time.perf_counter() - t0

    n_conv = int(jnp.sum(res.converged))
    phase_sum = sum(times.values())
    report = {
        "B": B,
        "backend": jax.default_backend(),
        "converged": f"{n_conv}/{B}",
        "total_wall_s": round(total, 2),
        "converged_solves_per_s": round(n_conv / total, 3),
        "phases_s": {k: round(v, 2) for k, v in sorted(
            times.items(), key=lambda kv: -kv[1])},
        "phase_calls": counts,
        "dispatch_and_host_s": round(total - phase_sum, 2),
        "mean_inner_quick_ms": round(
            1e3 * times.get("inner_quick", 0.0)
            / max(counts.get("inner_quick", 1), 1), 1),
        "mean_inner_full_ms": round(
            1e3 * times.get("inner_full", 0.0)
            / max(counts.get("inner_full", 1), 1), 1),
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
