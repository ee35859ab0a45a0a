"""Hopper model physics tests."""

import jax
import jax.numpy as jnp
import numpy as np

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
