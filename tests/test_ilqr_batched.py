"""Batched-native iLQR vs per-scenario solves."""

import jax
import jax.numpy as jnp
import numpy as np

from optimization_dynamics_tpu.dynamics import make_implicit_dynamics
from optimization_dynamics_tpu.models import acrobot
from optimization_dynamics_tpu.solver.ilqr import (
    ILQROptions,
    ILQRProblem,
    solve,
)
from optimization_dynamics_tpu.solver.ilqr_batched import solve_batched


def _lqr_problem(T=15, h=0.1):
    A = jnp.array([[1.0, h], [0.0, 1.0]])
    Bm = jnp.array([[0.5 * h * h], [h]])
    goal = jnp.array([1.0, 0.0])
    return ILQRProblem(
        T=T, nx=2, nu=1, ncon=0, nconT=2,
        dynamics=lambda t, x, u: A @ x + Bm @ u,
        dynamics_jac=lambda t, x, u: (A @ x + Bm @ u, A, Bm),
        dynamics_batched=lambda t, xs, us: xs @ A.T + us @ Bm.T,
        stage_cost=lambda t, x, u: 0.5 * jnp.sum(u * u),
        terminal_cost=lambda x: 0.0,
        terminal_con=lambda x: x - goal,
    )


def test_batched_lqr_matches_scalar():
    prob = _lqr_problem()
    opts = ILQROptions(con_tol=1e-5)
    B = 6
    key = jax.random.PRNGKey(0)
    x0s = 0.2 * jax.random.normal(key, (B, 2))
    us0 = jnp.zeros((prob.T - 1, 1))

    res_b = jax.jit(lambda x: solve_batched(prob, x, us0, opts))(x0s)
    assert bool(jnp.all(res_b.converged))

    for i in range(B):
        res_s = solve(prob, x0s[i], us0, opts)
        np.testing.assert_allclose(np.asarray(res_b.us[i]),
                                   np.asarray(res_s.us), atol=1e-5)


def test_batched_acrobot_contact():
    """Contact-implicit batched solve: short-horizon acrobot regulation
    near the joint limit converges for all lanes and matches scalar."""
    dyn = make_implicit_dynamics(acrobot.impact_model())
    aux = acrobot.AcrobotAux(h=0.05)
    T = 8
    goal = jnp.array([0.2, 1.2, 0.2, 1.2])
    prob = ILQRProblem(
        T=T, nx=4, nu=1, ncon=0, nconT=4,
        dynamics=lambda t, x, u: dyn.step(x, u, aux),
        dynamics_jac=lambda t, x, u: dyn.step_jac(x, u, aux),
        dynamics_jac_batched=lambda ts, xs, us: dyn.step_jac_batched(
            xs, us, aux),
        dynamics_batched=lambda t, xs, us: dyn.step_batched(xs, us, aux),
        stage_cost=lambda t, x, u: 0.5 * jnp.sum(u * u)
        + 0.5 * jnp.sum((x - goal) ** 2),
        terminal_cost=lambda x: 5.0 * jnp.sum((x - goal) ** 2),
    )
    opts = ILQROptions(max_iter=15, obj_tol=1e-6, grad_tol=1e-6)
    B = 4
    key = jax.random.PRNGKey(1)
    x0s = jnp.tile(jnp.array([0.1, 1.0, 0.1, 1.0]), (B, 1)) \
        + 0.05 * jax.random.normal(key, (B, 4))
    us0 = jnp.zeros((T - 1, 1))

    res_b = jax.jit(lambda x: solve_batched(prob, x, us0, opts))(x0s)
    assert bool(jnp.all(jnp.isfinite(res_b.xs)))

    for i in range(2):
        res_s = solve(prob, x0s[i], us0, opts)
        np.testing.assert_allclose(float(res_b.objective[i]),
                                   float(res_s.objective), rtol=1e-2)


def test_batched_warm_start_matches_cold():
    """Same-timestep warm starts in the batched phases: same objectives,
    fewer solver iterations inside (behavioral check: results agree)."""
    dyn = make_implicit_dynamics(acrobot.impact_model())
    aux = acrobot.AcrobotAux(h=0.05)
    T = 8
    goal = jnp.array([0.2, 1.2, 0.2, 1.2])
    base = ILQRProblem(
        T=T, nx=4, nu=1, ncon=0, nconT=4,
        dynamics=lambda t, x, u: dyn.step(x, u, aux),
        dynamics_jac=lambda t, x, u: dyn.step_jac(x, u, aux),
        dynamics_jac_batched=lambda ts, xs, us: dyn.step_jac_batched(
            xs, us, aux),
        dynamics_batched=lambda t, xs, us: dyn.step_batched(xs, us, aux),
        stage_cost=lambda t, x, u: 0.5 * jnp.sum(u * u)
        + 0.5 * jnp.sum((x - goal) ** 2),
        terminal_cost=lambda x: 5.0 * jnp.sum((x - goal) ** 2),
    )
    ws = base._replace(
        dynamics_batched_ws=lambda t, xs, us, w: dyn.step_batched_ws(
            xs, us, aux, w),
        dynamics_jac_batched_ws=lambda ts, xs, us, w:
            dyn.step_jac_batched_ws(xs, us, aux, w),
        ws_init_batched=lambda t, xs, us: jax.vmap(dyn.carry_init)(xs))
    opts = ILQROptions(max_iter=15, obj_tol=1e-6, grad_tol=1e-6)
    B = 4
    x0s = jnp.tile(jnp.array([0.1, 1.0, 0.1, 1.0]), (B, 1)) \
        + 0.05 * jax.random.normal(jax.random.PRNGKey(1), (B, 4))
    us0 = jnp.zeros((T - 1, 1))
    res_c = jax.jit(lambda x: solve_batched(base, x, us0, opts))(x0s)
    res_w = jax.jit(lambda x: solve_batched(ws, x, us0, opts))(x0s)
    np.testing.assert_allclose(np.asarray(res_w.objective),
                               np.asarray(res_c.objective), rtol=2e-2)
