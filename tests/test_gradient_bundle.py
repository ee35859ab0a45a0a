"""Gradient bundle ~ IFT Jacobians on smooth problems; runs on contact."""

import jax
import jax.numpy as jnp
import numpy as np

from optimization_dynamics_tpu.dynamics import make_implicit_dynamics
from optimization_dynamics_tpu.models import acrobot, planar_push as pp
from optimization_dynamics_tpu.solver.gradient_bundle import (
    make_gradient_bundle,
)


def test_bundle_matches_ift_smooth():
    dyn = make_implicit_dynamics(acrobot.nominal_model(),
                                 kappa_eval_tol=1.0, kappa_grad_tol=1.0)
    aux = acrobot.AcrobotAux(h=0.05)
    gb = make_gradient_bundle(dyn, n_samples=200, eps=1.0e-5)
    x = jnp.array([0.1, -0.2, 0.12, -0.18])
    u = jnp.array([0.3])
    y, fx, fu = jax.jit(dyn.step_jac)(x, u, aux)
    yb, fxb, fub = jax.jit(gb)(x, u, aux, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(yb), np.asarray(y), atol=1e-8)
    np.testing.assert_allclose(np.asarray(fxb), np.asarray(fx), atol=1e-3)
    np.testing.assert_allclose(np.asarray(fub), np.asarray(fu), atol=1e-3)


def test_bundle_on_contact_model_finite():
    dyn = make_implicit_dynamics(pp.model(), kappa_eval_tol=1e-4,
                                 kappa_grad_tol=1e-2)
    aux = pp.PlanarPushAux(h=0.1)
    gb = make_gradient_bundle(dyn, n_samples=50, eps=1.0e-4)
    q = jnp.array([0.0, 0.0, 0.0, -pp.R_DIM - 1e-8, 0.0])
    x = jnp.concatenate([q, q])
    u = jnp.array([1.0, 0.0])
    y, fx, fu = jax.jit(gb)(x, u, aux, jax.random.PRNGKey(1))
    assert bool(jnp.all(jnp.isfinite(fx)))
    assert bool(jnp.all(jnp.isfinite(fu)))
    assert fx.shape == (10, 10) and fu.shape == (10, 2)
