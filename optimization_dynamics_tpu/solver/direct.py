"""Direct (simultaneous) trajectory optimization: dense AL Gauss-Newton.

The reference compares its optimization-based-dynamics approach against a
direct contact-implicit transcription solved by an NLP solver
(/root/reference/examples/comparisons/hopper.jl, via
DirectTrajectoryOptimization.jl at tol 1e-2). This module provides that
baseline capability TPU-natively: all states, controls and contact forces
are stacked into one decision vector; dynamics become equality "defects";
complementarity becomes inequality rows; and the NLP is solved by an
augmented-Lagrangian outer loop with a Levenberg-Marquardt-damped
Gauss-Newton inner loop — one dense symmetric solve per iteration
(problem sizes here are a few hundred variables: ideal for one MXU-tiled
factorization instead of a host sparse solver).

Everything jits and vmaps (scenario batches of NLPs).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ["DirectOptions", "DirectProblem", "DirectResult", "solve_direct"]


@dataclasses.dataclass(frozen=True)
class DirectOptions:
    grad_tol: float = 1.0e-4
    con_tol: float = 1.0e-2        # reference DTO tol (comparisons/hopper.jl:292)
    max_iter: int = 50             # inner GN iterations per AL round
    max_al_iter: int = 10
    rho_init: float = 1.0
    rho_scale: float = 10.0
    lm_init: float = 1.0e-6
    lm_up: float = 10.0
    lm_down: float = 0.5
    lm_max: float = 1.0e10
    lambda_max: float = 1.0e8


class DirectProblem(NamedTuple):
    n: int
    objective: Callable                 # (w,) -> scalar
    eq_con: Optional[Callable] = None   # (w,) -> (m_eq,)  == 0
    ineq_con: Optional[Callable] = None  # (w,) -> (m_in,) <= 0


class DirectResult(NamedTuple):
    w: jnp.ndarray
    objective: jnp.ndarray
    constraint_violation: jnp.ndarray
    iterations: jnp.ndarray
    al_iterations: jnp.ndarray
    converged: jnp.ndarray


def solve_direct(prob: DirectProblem, w0: jnp.ndarray,
                 opts: DirectOptions = DirectOptions()) -> DirectResult:
    dtype = w0.dtype
    has_eq = prob.eq_con is not None
    has_in = prob.ineq_con is not None

    m_eq = prob.eq_con(w0).shape[0] if has_eq else 0
    m_in = prob.ineq_con(w0).shape[0] if has_in else 0

    def al_value(w, lam_eq, lam_in, rho):
        J = prob.objective(w)
        if has_eq:
            c = prob.eq_con(w)
            J = J + lam_eq @ c + 0.5 * rho * c @ c
        if has_in:
            c = prob.ineq_con(w)
            lam_new = jnp.maximum(0.0, lam_in + rho * c)
            J = J + jnp.sum(lam_new ** 2 - lam_in ** 2) / (2.0 * rho)
        return J

    def gn_grad_hess(w, lam_eq, lam_in, rho):
        g = jax.grad(prob.objective)(w)
        H = jax.hessian(prob.objective)(w)
        if has_eq:
            c = prob.eq_con(w)
            Jc = jax.jacfwd(prob.eq_con)(w)
            g = g + Jc.T @ (lam_eq + rho * c)
            H = H + rho * Jc.T @ Jc
        if has_in:
            c = prob.ineq_con(w)
            Jc = jax.jacfwd(prob.ineq_con)(w)
            mult = jnp.maximum(0.0, lam_in + rho * c)
            active = (lam_in + rho * c) > 0.0
            g = g + Jc.T @ mult
            H = H + rho * (Jc.T * active) @ Jc
        return g, H

    def violation(w):
        v = jnp.asarray(0.0, dtype)
        if has_eq:
            v = jnp.maximum(v, jnp.max(jnp.abs(prob.eq_con(w))))
        if has_in:
            v = jnp.maximum(v, jnp.max(jnp.maximum(prob.ineq_con(w), 0.0)))
        return v

    def inner(w, lam_eq, lam_in, rho):
        def cond(s):
            w, lm, it, done = s
            return jnp.logical_and(it < opts.max_iter, jnp.logical_not(done))

        def body(s):
            w, lm, it, done = s
            g, H = gn_grad_hess(w, lam_eq, lam_in, rho)
            Hd = H + lm * jnp.eye(prob.n, dtype=dtype)
            step = jnp.linalg.solve(Hd, g)
            w_new = w - step
            f0 = al_value(w, lam_eq, lam_in, rho)
            f1 = al_value(w_new, lam_eq, lam_in, rho)
            improved = jnp.logical_and(jnp.isfinite(f1), f1 < f0)
            w = jnp.where(improved, w_new, w)
            lm = jnp.where(improved,
                           jnp.maximum(lm * opts.lm_down, opts.lm_init),
                           jnp.minimum(lm * opts.lm_up, opts.lm_max))
            gnorm = jnp.max(jnp.abs(g))
            done = jnp.logical_or(gnorm < opts.grad_tol,
                                  jnp.logical_and(jnp.logical_not(improved),
                                                  lm >= opts.lm_max))
            return (w, lm, it + 1, done)

        w, lm, it, _ = jax.lax.while_loop(
            cond, body,
            (w, jnp.asarray(opts.lm_init, dtype),
             jnp.asarray(0, jnp.int32), jnp.asarray(False)))
        return w, it

    lam_eq0 = jnp.zeros(max(m_eq, 1), dtype)
    lam_in0 = jnp.zeros(max(m_in, 1), dtype)

    def al_cond(s):
        w, lam_eq, lam_in, rho, it, al_it, vio = s
        return jnp.logical_and(al_it < opts.max_al_iter,
                               jnp.logical_not(vio < opts.con_tol))

    def al_body(s):
        w, lam_eq, lam_in, rho, it, al_it, vio = s
        w, inner_it = inner(w, lam_eq, lam_in, rho)
        vio = violation(w)
        if has_eq:
            lam_eq = jnp.clip(lam_eq + rho * prob.eq_con(w),
                              -opts.lambda_max, opts.lambda_max)
        if has_in:
            lam_in = jnp.clip(
                jnp.maximum(0.0, lam_in + rho * prob.ineq_con(w)),
                0.0, opts.lambda_max)
        return (w, lam_eq, lam_in, rho * opts.rho_scale,
                it + inner_it, al_it + 1, vio)

    state = (w0, lam_eq0, lam_in0, jnp.asarray(opts.rho_init, dtype),
             jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
             jnp.asarray(jnp.inf, dtype))
    if has_eq or has_in:
        w, lam_eq, lam_in, rho, it, al_it, vio = jax.lax.while_loop(
            al_cond, al_body, state)
    else:
        w, it = inner(w0, lam_eq0, lam_in0, jnp.asarray(1.0, dtype))
        al_it = jnp.asarray(1, jnp.int32)
        vio = jnp.asarray(0.0, dtype)

    return DirectResult(
        w=w, objective=prob.objective(w),
        constraint_violation=vio, iterations=it, al_iterations=al_it,
        converged=vio < opts.con_tol)
