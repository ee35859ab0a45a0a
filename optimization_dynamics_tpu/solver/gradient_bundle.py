"""Gradient bundle: stochastic smoothing of implicit-dynamics Jacobians.

TPU-native re-design of /root/reference/src/gradient_bundle.jl — the
paper's sampled alternative to the relaxed-IFT gradients: perturb
(q1, q2, u) with N random single-coordinate perturbations, run N forward
solves, and fit a linear model ``f(eta) ~ f(0) + M eta`` by least squares;
``M`` replaces fx/fu.

Where the reference runs N sequential solves plus a Symbolics-generated
Gauss-Newton fit (gradient_bundle.jl:87-104, ls.jl), here the N solves are
one ``jax.vmap`` batch and the fit is a single batched ``lstsq`` — the
whole bundle is one fused XLA program per timestep, itself vmappable over
the horizon. ``fitter="gauss_newton"`` instead runs the reference's
iterated LS fit (solver/least_squares.fit ≙ ls.jl ``update!``) on the
same linear model — equivalent fits on well-posed samples, kept for
parity and for ill-conditioned bundles where the damped Newton is
better-behaved than the pseudo-inverse.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from optimization_dynamics_tpu.dynamics import ImplicitDynamics
from optimization_dynamics_tpu.solver import least_squares

__all__ = ["make_gradient_bundle"]


def make_gradient_bundle(dyn: ImplicitDynamics, n_samples: int = 100,
                         eps: float = 1.0e-4,
                         fitter: str = "lstsq") -> Callable:
    """Build ``gb_jac(x, u, aux, key) -> (y, fx, fu)``.

    Matches the reference sampling scheme (gradient_bundle.jl:49-54):
    each sample perturbs one uniformly-chosen coordinate of (q1, q2, u)
    by ``eps * N(0,1)``. ``fitter``: "lstsq" (direct solve) or
    "gauss_newton" (the reference's ls.jl iteration).
    """
    if fitter not in ("lstsq", "gauss_newton"):
        raise ValueError(f"unknown fitter {fitter!r}")
    nq = dyn.model.nq
    nu = dyn.model.nu
    n_in = 2 * nq + nu

    def gb_jac(x, u, aux, key):
        dtype = x.dtype
        k1, k2 = jax.random.split(key)
        coords = jax.random.randint(k1, (n_samples,), 0, n_in)
        mags = eps * jax.random.normal(k2, (n_samples,), dtype)
        etas = jnp.zeros((n_samples, n_in), dtype)
        etas = etas.at[jnp.arange(n_samples), coords].set(mags)

        y0 = dyn.step(x, u, aux)
        f0 = y0[nq:]

        def perturbed(eta):
            xp = x + eta[:2 * nq]
            up = u + eta[2 * nq:]
            return dyn.step(xp, up, aux)[nq:]

        f_eta = jax.vmap(perturbed)(etas)              # (N, nq)
        dF = f_eta - f0                                 # (N, nq)
        # least squares: etas @ M.T ~ dF  ->  M = (nq, n_in)
        if fitter == "lstsq":
            M = jnp.linalg.lstsq(etas, dF)[0].T
        else:
            # reference path: minimize sum_i ||dF_i - M eta_i||^2 by
            # Gauss-Newton over vec(M) (ls.jl:44-60 semantics; the
            # problem is linear so this converges in one damped step)
            def resid(theta, sample):
                eta_i, df_i = sample
                return df_i - theta.reshape(nq, n_in) @ eta_i

            # no damping: the model is linear in vec(M) and the normal
            # matrix scales like eps^2 (~1e-8) — any absolute damping
            # would bias the fit at that scale
            res = least_squares.fit(
                resid, jnp.zeros(nq * n_in, dtype), (etas, dF))
            M = res.theta.reshape(nq, n_in)

        eye = jnp.eye(nq, dtype=dtype)
        zero = jnp.zeros((nq, nq), dtype=dtype)
        fx = jnp.block([[zero, eye],
                        [M[:, :nq], M[:, nq:2 * nq]]])
        fu = jnp.concatenate(
            [jnp.zeros((nq, nu), dtype=dtype), M[:, 2 * nq:]], axis=0)
        return y0, fx, fu

    return gb_jac
