"""Parallel line search and parallel-in-time Riccati match the sequential
solver exactly."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from optimization_dynamics_tpu.solver.ilqr import (
    ILQROptions,
    ILQRProblem,
    solve,
)


def _problem(T=20, h=0.1):
    A = jnp.array([[1.0, h], [0.0, 1.0]])
    B = jnp.array([[0.5 * h * h], [h]])
    goal = jnp.array([1.0, 0.0])
    return ILQRProblem(
        T=T, nx=2, nu=1, ncon=0, nconT=2,
        dynamics=lambda t, x, u: A @ x + B @ u,
        dynamics_jac=lambda t, x, u: (A @ x + B @ u, A, B),
        stage_cost=lambda t, x, u: (0.5 * jnp.sum(u * u)
                                    + 0.01 * jnp.sum(x * x) * u[0] ** 2),
        terminal_cost=lambda x: 0.1 * jnp.sum(x * x),
        terminal_con=lambda x: x - goal,
    )


def _solve(prob, **kw):
    opts = dataclasses.replace(ILQROptions(con_tol=1e-5), **kw)
    return jax.jit(lambda x, u: solve(prob, x, u, opts))(
        jnp.zeros(2), jnp.zeros((prob.T - 1, prob.nu)))


def test_parallel_riccati_matches_sequential():
    prob = _problem()
    r_seq = _solve(prob)
    r_par = _solve(prob, parallel_riccati=True)
    assert bool(r_seq.converged) and bool(r_par.converged)
    np.testing.assert_allclose(np.asarray(r_seq.us), np.asarray(r_par.us),
                               atol=1e-7)


def test_parallel_linesearch_matches_sequential():
    prob = _problem()
    r_seq = _solve(prob)
    r_par = _solve(prob, parallel_linesearch=True)
    np.testing.assert_allclose(np.asarray(r_seq.us), np.asarray(r_par.us),
                               atol=1e-7)


def test_parallel_riccati_with_control_mask():
    """Padded control dims (hopper pattern) handled identically."""
    T, h = 15, 0.1
    A = jnp.array([[1.0, h], [0.0, 1.0]])
    B = jnp.array([[0.5 * h * h, 0.0], [h, 0.0]])   # second dim inert
    goal = jnp.array([0.5, 0.0])
    u_mask = jnp.zeros((T - 1, 2), bool).at[:, 0].set(True)
    prob = ILQRProblem(
        T=T, nx=2, nu=2, ncon=0, nconT=2,
        dynamics=lambda t, x, u: A @ x + B @ u,
        dynamics_jac=lambda t, x, u: (A @ x + B @ u, A, B),
        stage_cost=lambda t, x, u: 0.5 * jnp.sum(u * u),
        terminal_cost=lambda x: 0.0,
        terminal_con=lambda x: x - goal,
        u_mask=u_mask,
    )
    r_seq = _solve(prob)
    r_par = _solve(prob, parallel_riccati=True)
    assert bool(r_seq.converged) and bool(r_par.converged)
    np.testing.assert_allclose(np.asarray(r_seq.us), np.asarray(r_par.us),
                               atol=1e-7)
    # inert dim never actuated
    assert float(jnp.max(jnp.abs(r_par.us[:, 1]))) == 0.0
