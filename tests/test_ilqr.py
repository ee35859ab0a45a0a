"""AL-iLQR solver tests: analytic LQR, constrained toy problems."""

import jax
import jax.numpy as jnp
import numpy as np

from optimization_dynamics_tpu.solver.ilqr import (
    ILQROptions,
    ILQRProblem,
    rollout,
    solve,
)


def _double_integrator(T=20, h=0.1):
    A = jnp.array([[1.0, h], [0.0, 1.0]])
    B = jnp.array([[0.5 * h * h], [h]])

    def dynamics(t, x, u):
        return A @ x + B @ u

    def dynamics_jac(t, x, u):
        return A @ x + B @ u, A, B

    return A, B, dynamics, dynamics_jac


def _lqr_riccati(A, B, Q, R, QT, T):
    """Reference discrete Riccati solution for validation."""
    P = QT
    Ks = []
    for _ in range(T - 1):
        K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
        P = Q + A.T @ P @ (A - B @ K)
        Ks.append(K)
    return Ks[::-1]


def test_lqr_matches_analytic():
    T, h = 20, 0.1
    A, B, dynamics, dynamics_jac = _double_integrator(T, h)
    Q = jnp.eye(2) * 1.0
    R = jnp.eye(1) * 0.1
    QT = jnp.eye(2) * 10.0

    prob = ILQRProblem(
        T=T, nx=2, nu=1, ncon=0, nconT=0,
        dynamics=dynamics, dynamics_jac=dynamics_jac,
        stage_cost=lambda t, x, u: 0.5 * (x @ Q @ x + u @ R @ u),
        terminal_cost=lambda x: 0.5 * x @ QT @ x,
    )
    x0 = jnp.array([1.0, 0.0])
    us0 = jnp.zeros((T - 1, 1))
    res = jax.jit(lambda x, u: solve(prob, x, u))(x0, us0)

    # analytic optimal trajectory
    Ks = _lqr_riccati(np.asarray(A), np.asarray(B), np.asarray(Q),
                      np.asarray(R), np.asarray(QT), T)
    x = np.array([1.0, 0.0])
    xs_ref, us_ref = [x], []
    for K in Ks:
        u = -K @ x
        us_ref.append(u)
        x = np.asarray(A) @ x + np.asarray(B) @ u
        xs_ref.append(x)
    np.testing.assert_allclose(np.asarray(res.us), np.array(us_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.xs), np.array(xs_ref),
                               atol=1e-5)


def test_terminal_equality_constraint():
    """Reach a goal state exactly via the AL loop."""
    T, h = 20, 0.1
    _, _, dynamics, dynamics_jac = _double_integrator(T, h)
    goal = jnp.array([1.0, 0.0])

    prob = ILQRProblem(
        T=T, nx=2, nu=1, ncon=0, nconT=2,
        dynamics=dynamics, dynamics_jac=dynamics_jac,
        stage_cost=lambda t, x, u: 0.5 * jnp.sum(u * u),
        terminal_cost=lambda x: 0.0,
        terminal_con=lambda x: x - goal,
    )
    x0 = jnp.zeros(2)
    us0 = jnp.zeros((T - 1, 1))
    opts = ILQROptions(con_tol=1e-4, obj_tol=1e-8, grad_tol=1e-8)
    res = jax.jit(lambda x, u: solve(prob, x, u, opts))(x0, us0)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.xs[-1]), np.asarray(goal),
                               atol=1e-3)


def test_control_inequality_constraint():
    """Box-limited controls: |u| <= 0.3 enforced via AL inequality rows."""
    T, h = 25, 0.1
    _, _, dynamics, dynamics_jac = _double_integrator(T, h)
    # bang-bang reachable set with |u|<=0.3 over 2.4s is ~0.43; goal 0.4
    # keeps the limit active but feasible
    goal = jnp.array([0.4, 0.0])
    u_lim = 0.3

    def stage_con(t, x, u):
        return jnp.concatenate([u - u_lim, -u - u_lim])

    prob = ILQRProblem(
        T=T, nx=2, nu=1, ncon=2, nconT=2,
        dynamics=dynamics, dynamics_jac=dynamics_jac,
        stage_cost=lambda t, x, u: 0.5 * 1e-2 * jnp.sum(u * u),
        terminal_cost=lambda x: 0.0,
        stage_con=stage_con,
        terminal_con=lambda x: x - goal,
        ineq_mask=jnp.ones((T - 1, 2), bool),
    )
    x0 = jnp.zeros(2)
    us0 = jnp.zeros((T - 1, 1))
    opts = ILQROptions(con_tol=1e-3, obj_tol=1e-8, grad_tol=1e-6)
    res = jax.jit(lambda x, u: solve(prob, x, u, opts))(x0, us0)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.xs[-1]), np.asarray(goal),
                               atol=5e-3)
    assert float(jnp.max(jnp.abs(res.us))) <= u_lim + 2e-3


def test_rollout_shapes():
    T, h = 10, 0.1
    _, _, dynamics, dynamics_jac = _double_integrator(T, h)
    prob = ILQRProblem(
        T=T, nx=2, nu=1, ncon=0, nconT=0,
        dynamics=dynamics, dynamics_jac=dynamics_jac,
        stage_cost=lambda t, x, u: 0.0, terminal_cost=lambda x: 0.0)
    xs = rollout(prob, jnp.zeros(2), jnp.ones((T - 1, 1)))
    assert xs.shape == (T, 2)


def test_vmapped_solve_batch_of_goals():
    """The whole constrained solve vmaps over scenario batches."""
    T, h = 15, 0.1
    _, _, dynamics, dynamics_jac = _double_integrator(T, h)

    def make_solve(goal):
        prob = ILQRProblem(
            T=T, nx=2, nu=1, ncon=0, nconT=2,
            dynamics=dynamics, dynamics_jac=dynamics_jac,
            stage_cost=lambda t, x, u: 0.5 * jnp.sum(u * u),
            terminal_cost=lambda x: 0.0,
            terminal_con=lambda x: x - goal,
        )
        return solve(prob, jnp.zeros(2), jnp.zeros((T - 1, 1)),
                     ILQROptions(con_tol=1e-4))

    goals = jnp.array([[1.0, 0.0], [-0.5, 0.0], [0.3, 0.1], [2.0, -0.2]])
    res = jax.jit(jax.vmap(make_solve))(goals)
    assert bool(jnp.all(res.converged))
    np.testing.assert_allclose(np.asarray(res.xs[:, -1]), np.asarray(goals),
                               atol=1e-3)


def test_dual_warm_start_resolve():
    """Re-solving a nearby problem from the previous duals/penalty
    (ILQRResult.lam/lamT/rho) converges in fewer AL rounds than cold."""
    T, h = 25, 0.1
    _, _, dynamics, dynamics_jac = _double_integrator(T, h)
    goal = jnp.array([0.4, 0.0])
    u_lim = 0.3

    def stage_con(t, x, u):
        return jnp.concatenate([u - u_lim, -u - u_lim])

    prob = ILQRProblem(
        T=T, nx=2, nu=1, ncon=2, nconT=2,
        dynamics=dynamics, dynamics_jac=dynamics_jac,
        stage_cost=lambda t, x, u: 0.5 * 1e-2 * jnp.sum(u * u),
        terminal_cost=lambda x: 0.0,
        stage_con=stage_con,
        terminal_con=lambda x: x - goal,
        ineq_mask=jnp.ones((T - 1, 2), bool),
    )
    us0 = jnp.zeros((T - 1, 1))
    opts = ILQROptions(con_tol=1e-3, obj_tol=1e-8, grad_tol=1e-6)
    cold = jax.jit(lambda x, u: solve(prob, x, u, opts))
    res = cold(jnp.zeros(2), us0)
    assert bool(res.converged)
    assert res.lam.shape == (T - 1, 2) and res.lamT.shape == (2,)

    # perturbed scenario, warm AL state from the converged solve
    x0p = jnp.array([0.005, 0.0])
    warm = jax.jit(lambda x, u, l, lT, r: solve(
        prob, x, u, opts, lam_init=l, lamT_init=lT, rho_init=r))
    res_w = warm(x0p, res.us, res.lam, res.lamT, res.rho)
    res_c = cold(x0p, res.us)
    assert bool(res_w.converged) and bool(res_c.converged)
    assert int(res_w.al_iterations) <= int(res_c.al_iterations)
    assert int(res_w.al_iterations) <= 2
    np.testing.assert_allclose(np.asarray(res_w.xs[-1]), np.asarray(goal),
                               atol=5e-3)
