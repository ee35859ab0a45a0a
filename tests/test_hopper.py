"""Hopper model physics tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimization_dynamics_tpu.dynamics import make_implicit_dynamics
from optimization_dynamics_tpu.models import hopper as hp

P = hp.HopperParams()
AUX = hp.HopperAux(h=0.05)


def _dyn():
    return make_implicit_dynamics(hp.model(P), kappa_eval_tol=1e-4,
                                  kappa_grad_tol=1e-3)


def test_spec_and_residual_shapes():
    hp.cone_spec().validate()
    q = jnp.array([0.0, 0.6, 0.0, 0.5])
    z = hp.init_z(q)
    th = hp.pack_theta(q, q, jnp.zeros(2), jnp.array([0.5, 0.5]), 0.05)
    r = hp.residual(P, z, th, 1.0)
    assert r.shape == (hp.NZ,)
    assert bool(jnp.all(jnp.isfinite(r)))


def test_foot_kinematics():
    q = jnp.array([0.3, 0.8, 0.2, 0.5])
    f = hp.kinematics_foot(P, q)
    np.testing.assert_allclose(
        np.asarray(f),
        [0.3 + 0.5 * np.sin(0.2), 0.8 - 0.5 * np.cos(0.2)], atol=1e-12)


def test_drop_lands_without_penetration():
    dyn = _dyn()
    q = jnp.array([0.0, 1.0, 0.0, 0.5])
    x = jnp.concatenate([q, q])
    step = jax.jit(dyn.step_info)
    for _ in range(25):
        y, sol = step(x, jnp.zeros(2), AUX)
        assert bool(sol.converged)
        sd = hp.signed_distance(P, y[4:])
        assert float(jnp.min(sd)) > -1e-5
        x = y
    # foot at rest on the ground
    sd = np.asarray(hp.signed_distance(P, x[4:]))
    assert sd[1] < 1e-3


def test_friction_resists_slide():
    """A hopper standing on the ground pushed sideways by gravity under a
    body tilt: the foot tangential force must oppose slip (dissipation)."""
    dyn = _dyn()
    q1 = jnp.array([0.0, 0.5 + P.foot_radius, 0.0, 0.5])
    # give the body a lateral velocity
    q0 = q1 - jnp.array([0.05, 0.0, 0.0, 0.0])
    x = jnp.concatenate([q0, q1])
    u = jnp.array([0.0, P.gravity * P.mass_body * 0.05])
    y, sol = jax.jit(dyn.step_info)(x, u, AUX)
    assert bool(sol.converged)
    v_before = 1.0       # (q1 - q0)/h
    v_after = float((y[4] - y[0]) / 0.05)
    assert v_after < v_before  # friction dissipates lateral motion


def test_step_jac_finite_and_fd():
    dyn = _dyn()
    q1 = jnp.array([0.0, 0.9, 0.05, 0.5])
    q0 = q1 - 0.01
    x = jnp.concatenate([q0, q1])
    u = jnp.array([0.1, 0.2])
    dyn2 = make_implicit_dynamics(hp.model(P), kappa_eval_tol=1e-3,
                                  kappa_grad_tol=1e-3)
    y, fx, fu = jax.jit(dyn2.step_jac)(x, u, AUX)
    step = jax.jit(lambda x, u: dyn2.step(x, u, AUX))
    eps = 1e-6
    fd = np.zeros((8, 2))
    for j in range(2):
        fd[:, j] = (step(x, u.at[j].add(eps))
                    - step(x, u.at[j].add(-eps))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(fu), fd, atol=1e-5)


def test_deploy_batched_matches_scalar():
    """Deploy-tier batched hopper dynamics (unified t==0/t>0 branch
    select) == the scalar lax.cond path, at t=0 and t>=1."""
    from optimization_dynamics_tpu.examples import hopper as exh

    prob_s, x0, us0, opts = exh.build_problem(1)
    prob_b, x0b, us0b, _ = exh.build_deploy_problem(False, gait=1)
    rng = np.random.RandomState(0)
    B = 4
    xs = jnp.tile(x0, (B, 1)) + 0.01 * jnp.asarray(rng.randn(B, 16))
    us = jnp.tile(us0[0], (B, 1)) + 0.01 * jnp.asarray(rng.randn(B, 10))
    for t in (0, 3):
        ys_b = jax.jit(prob_b.dynamics_batched,
                       static_argnums=0)(t, xs, us)
        ys_s = jax.vmap(lambda x, u: prob_s.dynamics(t, x, u))(xs, us)
        np.testing.assert_allclose(np.asarray(ys_b), np.asarray(ys_s),
                                   atol=1e-7, err_msg=f"t={t}")
        ts = jnp.full((B,), t)
        yj, fxb, fub = prob_b.dynamics_jac_batched(ts, xs, us)
        _, fxs, fus = jax.vmap(
            lambda x, u: prob_s.dynamics_jac(t, x, u))(xs, us)
        np.testing.assert_allclose(np.asarray(fxb), np.asarray(fxs),
                                   atol=1e-6, err_msg=f"t={t}")
        np.testing.assert_allclose(np.asarray(fub), np.asarray(fus),
                                   atol=1e-6, err_msg=f"t={t}")
    # mixed-t sweep row assembly (the flattened derivative pattern)
    ts = jnp.array([0, 1, 2, 0])
    _, fxm, fum = prob_b.dynamics_jac_batched(ts, xs, us)
    assert float(jnp.max(jnp.abs(fxm[0]))) < 1e-12   # t=0: fx == 0
    assert float(jnp.max(jnp.abs(fxm[1]))) > 0.1     # t=1: fx populated


@pytest.mark.slow
def test_hopper_solve_batched_short():
    """State-augmented hopper gait through solve_batched on the CPU
    mesh (the deploy-tier program)."""
    import dataclasses

    from optimization_dynamics_tpu.examples import hopper as exh
    from optimization_dynamics_tpu.solver.ilqr_batched import (
        solve_batched)

    prob, x0, us0, opts = exh.build_deploy_problem(False, gait=1)
    opts = dataclasses.replace(opts, max_al_iter=6, con_tol=0.01)
    B = 2
    x0s = jnp.tile(x0, (B, 1))
    res = jax.jit(lambda xs: solve_batched(prob, xs, us0, opts))(x0s)
    assert bool(jnp.all(jnp.isfinite(res.xs)))
    n_conv = int(jnp.sum(res.converged))
    assert n_conv >= 1, np.asarray(res.constraint_violation)
    # travel + periodicity on converged lanes
    xT = np.asarray(res.xs[:, -1])
    trav = xT[:, 0] - xT[:, 8]
    conv = np.asarray(res.converged)
    assert np.all(trav[conv] >= 0.5 - 0.02), trav
