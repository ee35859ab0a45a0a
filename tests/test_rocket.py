"""Rocket model tests: MRP rotation, projection, implicit midpoint step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimization_dynamics_tpu.models import rocket


def _rotz(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def _roty(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, 0, s], [0, 1.0, 0], [-s, 0, c]])


def test_mrp_rotation_matches_axis_angle():
    # MRP for rotation of angle t about axis n is tan(t/4) n
    t = 0.7
    p = jnp.array([0.0, 0.0, np.tan(t / 4)])
    np.testing.assert_allclose(np.asarray(rocket.mrp_rotation(p)),
                               _rotz(t), atol=1e-12)
    p = jnp.array([0.0, np.tan(-0.3 / 4), 0.0])
    np.testing.assert_allclose(np.asarray(rocket.mrp_rotation(p)),
                               _roty(-0.3), atol=1e-12)


def _analytic_project(u, u_max):
    """Projection onto {||u_xy|| <= u_z} ∩ {u_z <= u_max} computed by
    dense enumeration of KKT cases via scipy-free local search."""
    import itertools
    best, best_d = None, np.inf
    # parameterize feasible set densely (coarse) then polish by bisection
    for uz in np.linspace(0.0, u_max, 2001):
        uxy = u[:2]
        n = np.linalg.norm(uxy)
        r = min(n, uz)
        cand = np.array([*(uxy * (r / n if n > 0 else 0.0)), uz])
        d = np.linalg.norm(cand - u)
        if d < best_d:
            best, best_d = cand, d
    return best


def test_soc_projection():
    dyn = rocket.make_rocket_dynamics(u_max=12.5)
    project = jax.jit(dyn.project)

    # interior point: unchanged
    u = jnp.array([1.0, -2.0, 5.0])
    np.testing.assert_allclose(np.asarray(project(u)), np.asarray(u),
                               atol=1e-3)

    # above u_max: clipped to u_max
    u = jnp.array([1.0, 1.0, 20.0])
    out = np.asarray(project(u))
    np.testing.assert_allclose(out, [1.0, 1.0, 12.5], atol=1e-3)

    # outside the cone: projected onto it
    u = jnp.array([3.0, 0.0, 1.0])
    out = np.asarray(project(u))
    ref = _analytic_project(np.asarray(u), 12.5)
    np.testing.assert_allclose(out, ref, atol=2e-2)
    assert np.linalg.norm(out[:2]) <= out[2] + 1e-6

    # way below the cone: projected near origin
    u = jnp.array([0.1, 0.0, -5.0])
    out = np.asarray(project(u))
    assert np.linalg.norm(out[:2]) <= out[2] + 1e-6


def test_projection_gradient_fd():
    dyn = rocket.make_rocket_dynamics(u_max=12.5)
    pj = jax.jit(dyn.project_jac)
    project = jax.jit(dyn.project)
    for u0 in ([1.0, -2.0, 5.0], [3.0, 0.5, 1.0]):
        u = jnp.array(u0)
        _, J = pj(u)
        eps = 1e-6
        fd = np.zeros((3, 3))
        for j in range(3):
            up = u.at[j].add(eps)
            um = u.at[j].add(-eps)
            fd[:, j] = (project(up) - project(um)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J), fd, atol=1e-4,
                                   err_msg=str(u0))


def test_hover_step():
    """Thrust = weight, upright: the rocket stays put."""
    p = rocket.RocketParams()
    dyn = rocket.make_rocket_dynamics(p, projection=False, h=0.05)
    x = jnp.zeros(12).at[2].set(5.0)
    u = jnp.array([0.0, 0.0, p.mass * p.gravity])
    y = jax.jit(dyn.step)(x, u)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-8)


def test_free_fall_step():
    p = rocket.RocketParams()
    h = 0.05
    dyn = rocket.make_rocket_dynamics(p, projection=False, h=h)
    x = jnp.zeros(12).at[2].set(10.0)
    y = jax.jit(dyn.step)(x, jnp.zeros(3))
    # z(t) = 10 - g t^2 / 2; implicit midpoint is exact for this
    np.testing.assert_allclose(float(y[2]), 10.0 - 0.5 * 9.81 * h * h,
                               atol=1e-8)
    np.testing.assert_allclose(float(y[8]), -9.81 * h, atol=1e-8)


def test_step_jac_fd():
    dyn = rocket.make_rocket_dynamics(projection=True, h=0.05)
    x = jnp.zeros(12).at[2].set(10.0).at[3].set(0.1).at[8].set(-1.0)
    u = jnp.array([0.3, -0.2, 9.0])
    y, fx, fu = jax.jit(dyn.step_jac)(x, u)
    step = jax.jit(dyn.step)
    eps = 1e-6
    fd_x = np.zeros((12, 12))
    for j in range(12):
        fd_x[:, j] = (step(x.at[j].add(eps), u)
                      - step(x.at[j].add(-eps), u)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(fx), fd_x, atol=1e-5)
    fd_u = np.zeros((12, 3))
    for j in range(3):
        fd_u[:, j] = (step(x, u.at[j].add(eps))
                      - step(x, u.at[j].add(-eps))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(fu), fd_u, atol=1e-4)


def test_batched_matches_scalar():
    """Lane-batched two-IP step (projection + midpoint) == vmapped
    scalar step/Jacobians (deploy tier, VERDICT r4 #4)."""
    dyn = rocket.make_rocket_dynamics(projection=True, h=0.05)
    rng = np.random.RandomState(0)
    B = 6
    xs = jnp.asarray(rng.randn(B, 12) * 0.3).at[:, 2].add(10.0)
    us = jnp.asarray(rng.randn(B, 3)).at[:, 2].add(9.0)
    ys_b = jax.jit(dyn.step_batched)(xs, us)
    ys_s = jax.vmap(dyn.step)(xs, us)
    np.testing.assert_allclose(np.asarray(ys_b), np.asarray(ys_s),
                               atol=1e-7)
    yb, fxb, fub = jax.jit(dyn.step_jac_batched)(xs, us)
    ys, fxs, fus = jax.vmap(dyn.step_jac)(xs, us)
    np.testing.assert_allclose(np.asarray(fxb), np.asarray(fxs),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(fub), np.asarray(fus),
                               atol=1e-6)
    # warm-started re-solve from the solution: same answer, fewer iters
    yw, zw = jax.jit(dyn.step_batched_ws)(xs, us, ys_b)
    np.testing.assert_allclose(np.asarray(yw), np.asarray(ys_b),
                               atol=1e-7)


@pytest.mark.slow
def test_rocket_solve_batched_short_horizon():
    """Short-horizon rocket descent through solve_batched on the CPU
    mesh: the deploy-tier program the chip bench runs."""
    from optimization_dynamics_tpu.examples import rocket as exr
    from optimization_dynamics_tpu.solver.ilqr_batched import (
        solve_batched)

    prob, x1, us0, opts = exr.build_deploy_problem(False)
    import dataclasses
    # T=11 keeps the CPU runtime sane; the full-horizon initial state
    # (10 m up) cannot reach the pad in 0.5 s, so start hovering just
    # above it — a feasible short descent through the same two-IP
    # deploy path
    prob = prob._replace(T=11)
    opts = dataclasses.replace(opts, max_iter=30, max_al_iter=12,
                               con_tol=0.02)
    B = 4
    rng = np.random.RandomState(0)
    _, xT = exr.initial_and_goal()
    x_near = np.asarray(xT).copy()   # goal attitude, just above the pad
    x_near[2] += 0.3
    x_near[8] = -0.3
    x0s = (jnp.tile(jnp.asarray(x_near), (B, 1))
           + 0.01 * jnp.asarray(rng.randn(B, 12)))
    res = jax.jit(lambda xs: solve_batched(prob, xs, us0[:10], opts))(
        x0s)
    assert bool(jnp.all(jnp.isfinite(res.xs)))
    # the truncated-horizon descent plateaus near-feasible (~0.027 —
    # the inner budget binds before the terminal z-velocity closes);
    # full-horizon convergence is pinned by tests/test_examples_e2e.
    # This test gates the deploy-tier batched plumbing: violations
    # driven near tolerance, flags consistent with them.
    vio = np.asarray(res.constraint_violation)
    assert np.all(vio < 0.05), vio
    assert np.array_equal(np.asarray(res.converged),
                          vio < opts.con_tol)
