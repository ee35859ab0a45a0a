"""Direct NLP solver tests on analytic problems."""

import jax
import jax.numpy as jnp
import numpy as np

from optimization_dynamics_tpu.solver.direct import (
    DirectOptions,
    DirectProblem,
    solve_direct,
)


def test_unconstrained_quadratic():
    Q = jnp.diag(jnp.array([1.0, 2.0, 3.0]))
    b = jnp.array([1.0, -2.0, 0.5])
    prob = DirectProblem(
        n=3, objective=lambda w: 0.5 * w @ Q @ w - b @ w)
    res = jax.jit(lambda w0: solve_direct(prob, w0))(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(res.w),
                               np.asarray(jnp.linalg.solve(Q, b)),
                               atol=1e-5)


def test_equality_constrained_qp():
    # min 0.5||w||^2 s.t. w1 + w2 = 1  ->  w = (0.5, 0.5)
    prob = DirectProblem(
        n=2,
        objective=lambda w: 0.5 * w @ w,
        eq_con=lambda w: jnp.array([w[0] + w[1] - 1.0]))
    opts = DirectOptions(con_tol=1e-6, grad_tol=1e-8)
    res = jax.jit(lambda w0: solve_direct(prob, w0, opts))(jnp.zeros(2))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.w), [0.5, 0.5], atol=1e-4)


def test_inequality_active_set():
    # min 0.5||w - (2, 0)||^2 s.t. w1 <= 1  ->  w = (1, 0)
    prob = DirectProblem(
        n=2,
        objective=lambda w: 0.5 * ((w[0] - 2.0) ** 2 + w[1] ** 2),
        ineq_con=lambda w: jnp.array([w[0] - 1.0]))
    opts = DirectOptions(con_tol=1e-6, grad_tol=1e-8)
    res = jax.jit(lambda w0: solve_direct(prob, w0, opts))(jnp.zeros(2))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.w), [1.0, 0.0], atol=1e-3)


def test_double_integrator_transcription():
    """Direct transcription of the reach problem matches the iLQR answer."""
    T, h = 10, 0.1
    A = np.array([[1.0, h], [0.0, 1.0]])
    B = np.array([[0.5 * h * h], [h]])
    goal = jnp.array([1.0, 0.0])
    nx, nu = 2, 1
    n = (T - 1) * (nx + nu)

    def split(w):
        xs = w[:(T - 1) * nx].reshape(T - 1, nx)
        us = w[(T - 1) * nx:].reshape(T - 1, nu)
        return xs, us

    def objective(w):
        xs, us = split(w)
        return 0.5 * jnp.sum(us * us)

    def eq_con(w):
        xs, us = split(w)
        x_prev = jnp.concatenate([jnp.zeros((1, nx)), xs[:-1]], axis=0)
        defects = xs - (x_prev @ jnp.asarray(A).T + us @ jnp.asarray(B).T)
        return jnp.concatenate([defects.reshape(-1), xs[-1] - goal])

    prob = DirectProblem(n=n, objective=objective, eq_con=eq_con)
    opts = DirectOptions(con_tol=1e-6, grad_tol=1e-8, max_al_iter=12)
    res = jax.jit(lambda w0: solve_direct(prob, w0, opts))(jnp.zeros(n))
    assert bool(res.converged)
    xs, us = split(res.w)
    np.testing.assert_allclose(np.asarray(xs[-1]), np.asarray(goal),
                               atol=1e-4)

    # compare objective against the iLQR solution of the same problem
    from optimization_dynamics_tpu.solver.ilqr import (
        ILQROptions, ILQRProblem, solve)
    iprob = ILQRProblem(
        T=T, nx=2, nu=1, ncon=0, nconT=2,
        dynamics=lambda t, x, u: jnp.asarray(A) @ x + jnp.asarray(B) @ u,
        dynamics_jac=lambda t, x, u: (jnp.asarray(A) @ x
                                      + jnp.asarray(B) @ u,
                                      jnp.asarray(A), jnp.asarray(B)),
        stage_cost=lambda t, x, u: 0.5 * jnp.sum(u * u),
        terminal_cost=lambda x: 0.0,
        terminal_con=lambda x: x - goal)
    ires = solve(iprob, jnp.zeros(2), jnp.zeros((T - 1, 1)),
                 ILQROptions(con_tol=1e-6, obj_tol=1e-10, grad_tol=1e-10))
    np.testing.assert_allclose(float(res.objective),
                               float(ires.objective), rtol=1e-3)
