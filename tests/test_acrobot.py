"""Acrobot implicit-step tests: physics sanity, joint limits, IFT grads."""

import jax
import jax.numpy as jnp
import numpy as np

from optimization_dynamics_tpu.dynamics import (
    make_implicit_dynamics,
    state_to_configuration,
)
from optimization_dynamics_tpu.models import acrobot

H = 0.05
AUX = acrobot.AcrobotAux(h=H)


def _dyn(**kw):
    return make_implicit_dynamics(acrobot.impact_model(), **kw)


def test_residual_shapes():
    p = acrobot.AcrobotParams()
    z = jnp.zeros(acrobot.NZ_IMPACT).at[2:].set(1.0)
    th = acrobot.pack_theta(jnp.zeros(2), jnp.zeros(2), jnp.zeros(1), H)
    r = acrobot.residual_impact(p, z, th, 0.0)
    assert r.shape == (acrobot.NZ_IMPACT,)


def test_hanging_equilibrium():
    """At the stable equilibrium (hanging down) with zero torque the
    acrobot stays put (limits inactive)."""
    dyn = _dyn()
    x = jnp.zeros(4)
    y, sol = jax.jit(dyn.step_info)(x, jnp.zeros(1), AUX)
    assert bool(sol.converged)
    np.testing.assert_allclose(np.asarray(y), np.zeros(4), atol=1e-6)


def test_fall_matches_nominal_when_inactive():
    """Away from the joint limits the impact model must match the smooth
    nominal model (the limit forces vanish as kappa -> 0)."""
    dyn_i = _dyn()
    dyn_n = make_implicit_dynamics(acrobot.nominal_model())
    x = jnp.array([0.3, 0.2, 0.31, 0.21])
    u = jnp.array([0.1])
    yi, si = jax.jit(dyn_i.step_info)(x, u, AUX)
    yn, sn = jax.jit(dyn_n.step_info)(x, u, AUX)
    assert bool(si.converged) and bool(sn.converged)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(yn), atol=1e-4)


def test_joint_limit_enforced():
    """Driving the elbow hard into its limit: phi(q3) >= -tol."""
    dyn = _dyn()
    x = jnp.array([0.0, 1.5, 0.0, 1.56])  # elbow just below +pi/2, moving up
    u = jnp.array([5.0])
    step = jax.jit(dyn.step_info)
    for _ in range(10):
        y, sol = step(x, u, AUX)
        assert bool(sol.converged)
        phi = acrobot.signed_distance(y[2:])
        assert float(jnp.min(phi)) > -1e-6
        x = y
    # limit actually active (elbow pinned near pi/2)
    assert abs(float(x[3]) - np.pi / 2) < 1e-2


def test_step_jac_matches_finite_difference_smooth_region():
    """In a smooth region, kappa_grad IFT Jacobians ~ FD of the eval step."""
    dyn = make_implicit_dynamics(
        acrobot.impact_model(),
        kappa_eval_tol=1e-3, kappa_grad_tol=1e-3)  # same relaxation => exact
    x = jnp.array([0.2, -0.3, 0.22, -0.28])
    u = jnp.array([0.4])
    y, fx, fu = jax.jit(dyn.step_jac)(x, u, AUX)

    step = jax.jit(lambda x, u: dyn.step(x, u, AUX))
    eps = 1e-6
    fx_fd = np.zeros((4, 4))
    for j in range(4):
        xp = x.at[j].add(eps)
        xm = x.at[j].add(-eps)
        fx_fd[:, j] = (step(xp, u) - step(xm, u)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(fx), fx_fd, atol=1e-5)

    fu_fd = np.zeros((4, 1))
    up = u.at[0].add(eps)
    um = u.at[0].add(-eps)
    fu_fd[:, 0] = (step(x, up) - step(x, um)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(fu), fu_fd, atol=1e-5)


def test_custom_vjp_matches_step_jac():
    dyn = _dyn()
    x = jnp.array([0.2, -0.3, 0.22, -0.28])
    u = jnp.array([0.4])
    _, fx, fu = dyn.step_jac(x, u, AUX)
    jx = jax.jacrev(lambda x: dyn.step_diff(x, u, AUX))(x)
    ju = jax.jacrev(lambda u: dyn.step_diff(x, u, AUX))(u)
    np.testing.assert_allclose(np.asarray(jx), np.asarray(fx), atol=1e-10)
    np.testing.assert_allclose(np.asarray(ju), np.asarray(fu), atol=1e-10)


def test_scan_rollout_and_vmap():
    """Rollout under lax.scan; batched over initial conditions via vmap."""
    dyn = _dyn()

    def rollout(x0, us):
        def f(x, u):
            y = dyn.step(x, u, AUX)
            return y, y
        _, ys = jax.lax.scan(f, x0, us)
        return ys

    T = 10
    us = jnp.zeros((T, 1))
    x0s = jnp.array([[0.0, 0.0, 0.0, 0.0],
                     [0.1, 0.0, 0.1, 0.0],
                     [0.0, 1.0, 0.0, 1.0]])
    ys = jax.jit(jax.vmap(rollout, in_axes=(0, None)))(x0s, us)
    assert ys.shape == (3, T, 4)
    assert bool(jnp.all(jnp.isfinite(ys)))
    qs = state_to_configuration(ys[0])
    assert qs.shape == (T + 1, 2)
