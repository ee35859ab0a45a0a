"""Batched-native IP solver == vmapped scalar solver."""

import jax
import jax.numpy as jnp
import numpy as np

from optimization_dynamics_tpu.models import acrobot, cartpole
from optimization_dynamics_tpu.solver.interior_point import (
    IPOptions,
    make_solver,
    make_solver_batched,
)


def test_batched_matches_vmap_acrobot():
    model = acrobot.impact_model()
    opts = IPOptions(r_tol=1e-8, kappa_tol=1e-4)
    solve_s = jax.jit(jax.vmap(make_solver(model.residual, model.spec,
                                           opts)))
    solve_b = jax.jit(make_solver_batched(model.residual, model.spec,
                                          opts))

    B = 12
    key = jax.random.PRNGKey(0)
    qs = 0.4 * jax.random.normal(key, (B, 2))
    z0s = jax.vmap(model.init_z)(qs)
    thetas = jax.vmap(
        lambda q: acrobot.pack_theta(q, q + 0.01, jnp.array([0.3]), 0.05)
    )(qs)

    sol_s = solve_s(z0s, thetas)
    sol_b = solve_b(z0s, thetas)
    assert bool(jnp.all(sol_s.converged))
    assert bool(jnp.all(sol_b.converged))
    np.testing.assert_allclose(np.asarray(sol_b.z), np.asarray(sol_s.z),
                               atol=1e-6)


def test_batched_matches_vmap_cartpole_friction():
    model = cartpole.friction_model()
    opts = IPOptions(r_tol=1e-8, kappa_tol=1e-4)
    solve_s = jax.jit(jax.vmap(make_solver(model.residual, model.spec,
                                           opts)))
    solve_b = jax.jit(make_solver_batched(model.residual, model.spec,
                                          opts))

    B = 8
    key = jax.random.PRNGKey(1)
    qs = 0.1 * jax.random.normal(key, (B, 2))
    us = 0.5 * jax.random.normal(key, (B, 1))
    z0s = jax.vmap(model.init_z)(qs)
    fr = jnp.array([0.35, 0.35])
    thetas = jax.vmap(
        lambda q, u: cartpole.pack_theta_friction(q, q + 0.002, u, fr,
                                                  0.05))(qs, us)
    sol_s = solve_s(z0s, thetas)
    sol_b = solve_b(z0s, thetas)
    assert bool(jnp.all(sol_s.converged))
    assert bool(jnp.all(sol_b.converged))
    np.testing.assert_allclose(np.asarray(sol_b.z), np.asarray(sol_s.z),
                               atol=1e-6)


def test_batched_handles_mixed_convergence():
    """Lanes that cannot converge stall out without harming others."""
    model = acrobot.impact_model()
    opts = IPOptions(r_tol=1e-8, kappa_tol=1e-4, max_iter=30)
    solve_b = jax.jit(make_solver_batched(model.residual, model.spec,
                                          opts))
    good_q = jnp.array([0.1, 0.2])
    bad_q = jnp.array([0.0, 9.0])     # far outside the joint limit
    z0s = jnp.stack([model.init_z(good_q), model.init_z(bad_q)])
    thetas = jnp.stack([
        acrobot.pack_theta(good_q, good_q, jnp.zeros(1), 0.05),
        acrobot.pack_theta(bad_q, bad_q, jnp.zeros(1), 0.05),
    ])
    sol = solve_b(z0s, thetas)
    assert bool(sol.converged[0])
    assert bool(jnp.all(jnp.isfinite(sol.z)))
