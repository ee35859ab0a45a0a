"""Gauss-Newton least-squares fitter (solver/least_squares.py).

Validates against the reference's embedded worked example
(/root/reference/src/ls.jl:62-144): recover the linear system
``f(z) = A x + B u`` from 2*nz single-coordinate +/- eps perturbations,
and the gradient-bundle wiring of the fitter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimization_dynamics_tpu.solver import least_squares


def test_recovers_linear_system():
    # the reference's test system (ls.jl:63-70): A=[1 1; 0 1], B=[0; 1]
    A = jnp.array([[1.0, 1.0], [0.0, 1.0]])
    Bm = jnp.array([[0.0], [1.0]])
    AB = jnp.concatenate([A, Bm], axis=1)          # (2, 3)
    nx, nz = 2, 3

    def f(z):
        return AB @ z

    # sampling scheme of ls.jl:113-119: +eps and -eps on each coordinate
    eps = 0.1
    etas = jnp.concatenate([eps * jnp.eye(nz), -eps * jnp.eye(nz)])
    z0 = jax.random.uniform(jax.random.PRNGKey(3), (nz,))
    dF = jax.vmap(lambda e: f(z0 + e) - f(z0))(etas)   # (2*nz, nx)

    def resid(theta, sample):
        eta_i, df_i = sample
        return df_i - theta.reshape(nx, nz) @ eta_i

    res = least_squares.fit(resid, jnp.zeros(nx * nz), (etas, dF))
    assert bool(res.converged)
    # exact recovery of [A B] (the system is linear)
    np.testing.assert_allclose(np.asarray(res.theta.reshape(nx, nz)),
                               np.asarray(AB), atol=1e-8)


def test_nonlinear_fit_converges():
    # nonlinear residual: fit (a, b) of y = a * exp(b * t)
    ts = jnp.linspace(0.0, 1.0, 20)
    theta_true = jnp.array([2.0, -1.3])
    ys = theta_true[0] * jnp.exp(theta_true[1] * ts)

    def resid(theta, sample):
        t_i, y_i = sample
        return jnp.atleast_1d(y_i - theta[0] * jnp.exp(theta[1] * t_i))

    res = least_squares.fit(resid, jnp.array([1.0, 0.0]), (ts, ys),
                            damping=1e-10)
    np.testing.assert_allclose(np.asarray(res.theta),
                               np.asarray(theta_true), atol=1e-6)


def test_gradient_bundle_gauss_newton_matches_lstsq():
    from optimization_dynamics_tpu.dynamics import make_implicit_dynamics
    from optimization_dynamics_tpu.models import cartpole
    from optimization_dynamics_tpu.solver.gradient_bundle import (
        make_gradient_bundle)

    dyn = make_implicit_dynamics(cartpole.frictionless_model(),
                                 kappa_eval_tol=1.0, kappa_grad_tol=1.0)
    aux = cartpole.CartpoleAux(h=0.05, friction=None)
    x = jnp.array([0.1, 0.2, 0.05, 0.22])
    u = jnp.array([0.3])
    key = jax.random.PRNGKey(0)
    gb_ls = make_gradient_bundle(dyn, n_samples=50, eps=1e-4)
    gb_gn = make_gradient_bundle(dyn, n_samples=50, eps=1e-4,
                                 fitter="gauss_newton")
    y1, fx1, fu1 = gb_ls(x, u, aux, key)
    y2, fx2, fu2 = gb_gn(x, u, aux, key)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))
    np.testing.assert_allclose(np.asarray(fx1), np.asarray(fx2),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fu1), np.asarray(fu2),
                               atol=1e-6, rtol=1e-5)


def test_unknown_fitter_raises():
    from optimization_dynamics_tpu.dynamics import make_implicit_dynamics
    from optimization_dynamics_tpu.models import cartpole
    from optimization_dynamics_tpu.solver.gradient_bundle import (
        make_gradient_bundle)

    dyn = make_implicit_dynamics(cartpole.frictionless_model())
    with pytest.raises(ValueError):
        make_gradient_bundle(dyn, fitter="qr")
