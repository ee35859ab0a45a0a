"""Batched Gauss-Newton least-squares fitter.

TPU-native equivalent of the reference's ``LeastSquares``
(/root/reference/src/ls.jl): fit parameters ``theta`` minimizing
``sum_i ||r(theta; sample_i)||^2`` by damped Newton on the normal
equations. Where the reference builds cost/grad/Hessian kernels with
Symbolics and loops samples sequentially (ls.jl:20-60), here the residual
is a pure JAX function, sample sums are ``vmap`` reductions, and the
Newton loop is a ``lax.while_loop`` — the whole fit jits and vmaps.

For the linear fits used by the gradient bundle a single ``lstsq`` is
cheaper (see solver/gradient_bundle.py); this module is the general
nonlinear tool with reference-matching semantics (tol 1e-8, <= 100
iterations, ls.jl:44-60).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["LSResult", "fit"]


class LSResult(NamedTuple):
    theta: jnp.ndarray
    iterations: jnp.ndarray
    grad_norm: jnp.ndarray
    converged: jnp.ndarray


def fit(residual_fn: Callable, theta0: jnp.ndarray, samples,
        tol: float = 1.0e-8, max_iter: int = 100,
        damping: float = 0.0) -> LSResult:
    """Minimize ``sum_i ||residual_fn(theta, sample_i)||^2``.

    ``samples`` is a pytree whose leaves have a leading sample axis.
    """

    def total_cost(theta):
        r = jax.vmap(lambda s: residual_fn(theta, s))(samples)
        return jnp.sum(r * r)

    grad_fn = jax.grad(total_cost)
    hess_fn = jax.hessian(total_cost)

    def cond(state):
        theta, it, gnorm = state
        return jnp.logical_and(it < max_iter, gnorm > tol)

    def body(state):
        theta, it, gnorm = state
        g = grad_fn(theta)
        H = hess_fn(theta)
        if damping > 0.0:
            H = H + damping * jnp.eye(theta.shape[0], dtype=theta.dtype)
        delta = jnp.linalg.solve(H, g)
        theta = theta - delta
        return theta, it + 1, jnp.max(jnp.abs(grad_fn(theta)))

    g0 = jnp.max(jnp.abs(grad_fn(theta0)))
    theta, it, gnorm = jax.lax.while_loop(
        cond, body, (theta0, jnp.asarray(0, jnp.int32), g0))
    return LSResult(theta=theta, iterations=it, grad_norm=gnorm,
                    converged=gnorm <= tol)
