"""Benchmark: full contact-implicit iLQR solves per second on one chip.

Headline metric per BASELINE.md north star: batched cartpole-with-friction
swing-up solves (reference configuration T=51, friction 0.35,
/root/reference/examples/cartpole.jl) run as one vmapped XLA program.
``vs_baseline`` is measured against the north-star per-chip share of the
v5e-16 target (1000 solves/s / 16 chips = 62.5 solves/s/chip).

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    on_tpu = jax.default_backend() != "cpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    # persistent compilation cache: first bench run pays the (slow, remote)
    # TPU compile; subsequent runs start hot
    import os
    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from optimization_dynamics_tpu.examples import cartpole as ex
    from optimization_dynamics_tpu.solver.ilqr import solve
    from optimization_dynamics_tpu.solver.interior_point import IPOptions

    dtype = jnp.float32 if on_tpu else jnp.float64
    B = 256 if on_tpu else 8

    if on_tpu:
        # f32-friendly tolerances: residual floor ~1e-5, same kappa design
        from optimization_dynamics_tpu.dynamics import make_implicit_dynamics
        from optimization_dynamics_tpu.models import cartpole
        prob, x0, us0, opts = ex.build_problem("friction", dtype=dtype)
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
            dynamics_jac=lambda t, x, u: dyn.step_jac(x, u, aux))
        opts = opts.__class__(**{**opts.__dict__, "con_tol": 0.01})
    else:
        prob, x0, us0, opts = ex.build_problem("friction", dtype=dtype)

    def solve_one(x0_i):
        return solve(prob, x0_i, us0.astype(dtype), opts)

    # scenario batch: perturbed initial cart positions
    key = jax.random.PRNGKey(0)
    x0s = (jnp.tile(x0.astype(dtype), (B, 1))
           + 0.01 * jax.random.normal(key, (B, 4), dtype))

    run = jax.jit(jax.vmap(solve_one))
    res = run(x0s)                      # compile + warmup
    jax.block_until_ready(res.xs)

    t0 = time.perf_counter()
    res = run(x0s)
    jax.block_until_ready(res.xs)
    dt = time.perf_counter() - t0

    solves_per_s = B / dt
    n_converged = int(jnp.sum(res.converged))
    target_per_chip = 1000.0 / 16.0
    print(json.dumps({
        "metric": "cartpole-friction full iLQR solves/s (1 chip, batch %d, %d/%d converged)"
                  % (B, n_converged, B),
        "value": round(solves_per_s, 3),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / target_per_chip, 3),
    }))


if __name__ == "__main__":
    main()
