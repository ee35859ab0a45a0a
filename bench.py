"""Benchmark: full contact-implicit iLQR solves per second on one chip.

Headline metric per BASELINE.md north star: batched cartpole-with-friction
swing-up solves (reference configuration T=51, friction 0.35,
/root/reference/examples/cartpole.jl) run as one vmapped XLA program with
trajectory warm starts, parallel Armijo line search and the
associative-scan Riccati pass. ``vs_baseline`` is measured against the
north-star per-chip share of the v5e-16 target (1000 / 16 = 62.5
solves/s/chip).

Prints exactly one JSON line.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp


def _build(on_tpu: bool, dtype):
    from optimization_dynamics_tpu.dynamics import make_implicit_dynamics
    from optimization_dynamics_tpu.examples import cartpole as ex
    from optimization_dynamics_tpu.models import cartpole
    from optimization_dynamics_tpu.solver.interior_point import IPOptions

    prob, x0, us0, opts = ex.build_problem("friction", dtype=dtype)
    if on_tpu:
        # f32-friendly tolerances: residual floor ~3e-5, same kappa design
        model = cartpole.friction_model()
        aux = cartpole.CartpoleAux(
            h=ex.H, friction=jnp.asarray([0.35, 0.35], dtype))
        dyn = make_implicit_dynamics(
            model,
            eval_opts=IPOptions(r_tol=3.0e-5, kappa_tol=1.0e-3,
                                max_iter=40, max_ls=8),
            grad_opts=IPOptions(r_tol=3.0e-5, kappa_tol=1.0e-3,
                                max_iter=40, max_ls=8))
        prob = prob._replace(
            dynamics=lambda t, x, u: dyn.step(x, u, aux),
            dynamics_jac=lambda t, x, u: dyn.step_jac(x, u, aux),
            dynamics_carry=lambda t, x, u, z: dyn.step_carry(z, x, u, aux),
            carry_init=dyn.carry_init)
        # parallel_linesearch is off on TPU: its vmap-of-rollout pattern
        # currently trips a runtime fault on this backend (docs/DESIGN.md §6)
        opts = dataclasses.replace(
            opts, con_tol=0.01, parallel_riccati=True)
    return prob, x0, us0, opts


def main():
    on_tpu = jax.default_backend() != "cpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from optimization_dynamics_tpu.solver.ilqr import solve

    dtype = jnp.float32 if on_tpu else jnp.float64
    prob, x0, us0, opts = _build(on_tpu, dtype)

    def solve_one(x0_i):
        return solve(prob, x0_i, us0.astype(dtype), opts)

    # NOTE: vmapped full-solve programs currently fault on this TPU
    # backend (vmap x scan x while_loop pattern; single solves and every
    # building block pass — docs/DESIGN.md §6), so the round-1 headline
    # is single-solve latency. Scenario throughput via batching is the
    # next-round target once the backend issue is resolved.
    run = jax.jit(solve_one)
    res = run(x0.astype(dtype))              # compile + warmup
    jax.block_until_ready(res.xs)
    runs = 3
    t0 = time.perf_counter()
    for _ in range(runs):
        res = run(x0.astype(dtype))
        jax.block_until_ready(res.xs)
    dt = (time.perf_counter() - t0) / runs

    solves_per_s = 1.0 / dt
    target_per_chip = 1000.0 / 16.0
    print(json.dumps({
        "metric": ("cartpole-friction full iLQR solve latency, 1 chip "
                   "(converged=%s, obj=%.2f)"
                   % (bool(res.converged), float(res.objective))),
        "value": round(solves_per_s, 3),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / target_per_chip, 4),
    }))


if __name__ == "__main__":
    main()
