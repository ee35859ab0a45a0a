"""Functional path-following interior-point solver for cone-complementarity
problems, with implicit-function-theorem sensitivities.

This is the TPU-native re-design of the reference's inner engine
(`RoboDojo.InteriorPoint`, behavior pinned at
/root/reference/src/dynamics.jl:16-49 and
/root/reference/src/models/rocket/dynamics.jl:13-99):

  * solves ``r(z, theta, kappa) = 0`` where the residual's bilinear rows
    encode orthant / second-order-cone complementarity relaxed by the
    central-path parameter ``kappa``;
  * a damped Newton method with an analytic fraction-to-boundary step and a
    *vectorized* backtracking line search (all ``max_ls`` candidate step
    lengths are evaluated in one batched residual call — branch-free, so the
    whole solve is a single ``lax.while_loop`` that vmaps over scenarios);
  * the relaxation is driven down a geometric schedule until the
    complementarity products sit just below ``kappa_tol`` — matching the
    reference's two-tolerance design where *gradient* solves stop at a large
    ``kappa_tol`` (1e-2/1e-3) to differentiate the smoothed problem while
    *evaluation* solves run to 1e-4 (/root/reference/src/dynamics.jl:51-65);
  * sensitivities via the IFT at the relaxed solution:
    ``dz/dtheta = -(dr/dz)^-1 dr/dtheta``.

Everything is pure JAX: trace-once, jit/vmap/scan-compatible, fixed shapes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from optimization_dynamics_tpu.ops.cones import (ConeSpec, delta_products,
                                                 step_to_boundary)
from optimization_dynamics_tpu.ops.linalg import (batched_newton_solve,
                                                  newton_solve)

__all__ = ["IPOptions", "IPSolution", "make_solver", "make_solver_batched",
           "make_sensitivity", "make_sensitivity_batched"]


@dataclasses.dataclass(frozen=True)
class IPOptions:
    """Solver options.

    Field names follow the reference's ``InteriorPointOptions``
    (/root/reference/src/dynamics.jl:25-33) so settings transfer 1:1.
    ``kappa_tol`` is the convergence tolerance on the complementarity
    products; the solver parks the central path at
    ``kappa_final_frac * kappa_tol``.
    """

    r_tol: float = 1.0e-8
    kappa_tol: float = 1.0e-4
    max_iter: int = 80
    max_ls: int = 25
    gamma_reg: float = 0.0
    kappa_scale: float = 0.1       # geometric central-path decrease
    kappa_final_frac: float = 0.8  # park products at this fraction of kappa_tol
    kappa_init_max: float = 1.0    # cap on the initial relaxation
    # floor on the initial relaxation: a warm start whose products already
    # sit at kappa_final would otherwise skip the continuation entirely,
    # and plain Newton at tiny kappa can select a different
    # complementarity branch than path-following does. A small floor
    # restores a short continuation while keeping the warm iterate.
    kappa_init_min: float = 0.0
    center_frac: float = 0.1       # inner solve tol: |r|_inf < center_frac*kappa
    tau_min: float = 0.75          # most conservative fraction-to-boundary
    tau_max: float = 0.99
    # Mehrotra predictor-corrector: per iteration, an affine predictor
    # solve picks the central-path target adaptively —
    # kappa <- clip(max(sigma*mu, infeas_frac*|r_eq|_inf), kappa_final,
    # kappa) with sigma = (mu_aff/mu)^3 (monotone, never aiming products
    # below the current infeasibility level: a "balanced" path) — and the
    # corrector reuses the factorization with the a_aff^2-damped
    # second-order Δw∘Δλ term added (RoboDojo's general_correction_term!
    # semantics). Costs one extra back-substitution + one residual sweep
    # per iteration; typically 2-3x fewer iterations.
    mehrotra: bool = False
    mehrotra_infeas_frac: float = 0.1
    verbose: bool = False          # per-iteration jax.debug.print logs


class IPSolution(NamedTuple):
    z: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray
    r_vio: jnp.ndarray
    kappa_vio: jnp.ndarray


def _cone_reset(spec: ConeSpec, dtype):
    """(mask, template) for a branch-free cone-variable reset:
    ``z_reset = where(mask, template, z)``. Mirrors ``interior_init`` but
    as pure elementwise ops (no scatters inside the solver loop)."""
    mask = np.zeros(spec.nz, bool)
    template = np.zeros(spec.nz)
    for i in list(spec.ort_prim) + list(spec.ort_dual):
        mask[i] = True
        template[i] = 1.0
    for grp in list(spec.soc_prim) + list(spec.soc_dual):
        mask[grp[0]] = True
        template[grp[0]] = 1.0
        for i in grp[1:]:
            mask[i] = True
            template[i] = 0.1
    return jnp.asarray(mask), jnp.asarray(template, dtype)


def _row_masks(spec: ConeSpec, dtype):
    """(equality-row mask, bilinear-row mask, kappa-head mask) as vectors."""
    eq = np.zeros(spec.nz)
    bil = np.zeros(spec.nz)
    head = np.zeros(spec.nz)
    eq[list(spec.eq_rows)] = 1.0
    for i in spec.ort_rows:
        bil[i] = 1.0
        head[i] = 1.0
    for grp in spec.soc_rows:
        for j, i in enumerate(grp):
            bil[i] = 1.0
            if j == 0:
                head[i] = 1.0
    return (jnp.asarray(eq, dtype), jnp.asarray(bil, dtype),
            jnp.asarray(head, dtype))


def make_solver(residual_fn: Callable, spec: ConeSpec, opts: IPOptions,
                jacobian_fn: Callable | None = None) -> Callable:
    """Build ``solve(z0, theta) -> IPSolution``.

    ``residual_fn(z, theta, kappa)`` must be a pure JAX function returning a
    ``(nz,)`` residual. ``jacobian_fn(z, theta)`` optionally supplies
    ``dr/dz`` (otherwise ``jax.jacfwd`` is used — the TPU replacement for the
    reference's Symbolics codegen, /root/reference/src/models/*/codegen.jl).

    The returned function is jit-safe and vmappable over (z0, theta).
    """
    spec.validate()
    if jacobian_fn is None:
        jacobian_fn = jax.jacfwd(lambda z, th: residual_fn(z, th, 0.0))

    has_cones = bool(spec.ort_prim) or bool(spec.soc_prim)
    kappa_final = opts.kappa_final_frac * opts.kappa_tol
    ls_exps = jnp.arange(opts.max_ls)
    use_meh = opts.mehrotra and has_cones
    n_cones = max(len(spec.ort_rows) + len(spec.soc_rows), 1)

    def solve(z0: jnp.ndarray, theta: jnp.ndarray) -> IPSolution:
        dtype = z0.dtype
        eq_mask, bil_mask, head_mask = _row_masks(spec, dtype)

        def vio(r0):
            r_vio = jnp.max(jnp.abs(r0) * eq_mask)
            k_vio = jnp.max(jnp.abs(r0) * bil_mask) if has_cones else jnp.asarray(0.0, dtype)
            return r_vio, k_vio

        def merit(r0, kappa):
            # |r(z, theta, kappa)|_inf given r0 = r(z, theta, 0)
            return jnp.max(jnp.abs(r0 - kappa * head_mask))

        r0_init = residual_fn(z0, theta, 0.0)
        rv0, kv0 = vio(r0_init)
        if has_cones:
            kappa_lo = max(kappa_final, opts.kappa_init_min)
            kappa0 = jnp.clip(kv0, kappa_lo, opts.kappa_init_max)
        else:
            kappa0 = jnp.asarray(kappa_final, dtype)

        def converged(r0):
            # Converged exactly to the kappa_final central-path point: the
            # solved map z*(theta) is then a well-defined smooth function,
            # which makes the IFT sensitivities of the *relaxed* problem
            # exact (reference semantics: products parked just under
            # kappa_tol, /root/reference/src/dynamics.jl:51-65).
            return merit(r0, kappa_final) < opts.r_tol

        def cond(state):
            z, kappa, r0, it, stalled, reinit_used = state
            return jnp.logical_and(
                it < opts.max_iter,
                jnp.logical_not(jnp.logical_or(converged(r0), stalled)),
            )

        def body(state):
            z, kappa, r0, it, stalled, reinit_used = state

            J = jacobian_fn(z, theta)
            if opts.gamma_reg > 0.0:
                J = J + (opts.gamma_reg * kappa) * jnp.eye(spec.nz, dtype=dtype)
            if use_meh:
                # Predictor: affine direction toward kappa = 0; its step
                # quality sets the centering weight sigma. The new target
                # kappa = clip(max(sigma*mu, infeas_frac*|r_eq|), kf, kappa)
                # is monotone and never aims products below the current
                # equality infeasibility (an adaptive target that collapses
                # while the iterate is still infeasible wedges the line
                # search at active contacts).
                lu_piv = jax.scipy.linalg.lu_factor(J)
                d_aff = jax.scipy.linalg.lu_solve(lu_piv, r0)
                a_aff = step_to_boundary(spec, z, d_aff, tau=1.0)
                r_aff = residual_fn(z - a_aff * d_aff, theta, 0.0)
                mu = jnp.sum(head_mask * r0) / n_cones
                mu_aff = jnp.maximum(
                    jnp.sum(head_mask * r_aff) / n_cones, 0.0)
                sigma = jnp.clip(
                    (mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)
                r_eq = jnp.max(jnp.abs(r0) * eq_mask)
                descending = mu > 1.25 * kappa_final
                kappa = jnp.where(
                    descending,
                    jnp.clip(jnp.maximum(
                        sigma * mu, opts.mehrotra_infeas_frac * r_eq),
                        kappa_final, kappa),
                    kappa_final).astype(dtype)
                r_k = r0 - kappa * head_mask
                merit_cur = jnp.max(jnp.abs(r_k))
                # Corrector (RoboDojo general_correction_term! semantics),
                # scaled by a_aff^2: the second-order products of the step
                # actually achievable — the unscaled term is quadratic in
                # the direction and poisons the search when the iterate is
                # still infeasible (large |d_aff|, tiny a_aff). Off once mu
                # reaches the parking floor: its O(kappa) bias in
                # weakly-active (degenerate) coordinates would keep the
                # parked merit above r_tol; plain Newton parks
                # quadratically from there.
                corr = jnp.where(descending,
                                 (a_aff * a_aff)
                                 * delta_products(spec, d_aff), 0.0)
                delta = jax.scipy.linalg.lu_solve(lu_piv, r_k + corr)
            else:
                r_k = r0 - kappa * head_mask
                merit_cur = jnp.max(jnp.abs(r_k))
                delta = newton_solve(J, r_k)

            tau = jnp.clip(1.0 - merit_cur, opts.tau_min, opts.tau_max)
            alpha0 = step_to_boundary(spec, z, delta, tau=1.0) * tau
            alpha0 = jnp.minimum(alpha0, 1.0)

            alphas = alpha0 * (0.5 ** ls_exps).astype(dtype)
            cand_merit = jax.vmap(
                lambda a: merit(residual_fn(z - a * delta, theta, 0.0), kappa)
            )(alphas)
            improves = cand_merit < merit_cur
            any_improve = jnp.any(improves)
            first = jnp.argmax(improves)          # first True (largest alpha)
            best = jnp.argmin(cand_merit)
            pick = jnp.where(any_improve, first, best)
            alpha = alphas[pick]
            new_merit = cand_merit[pick]
            # no candidate decreased the merit -> stall out instead of cycling
            stalled_new = jnp.logical_not(any_improve)

            z_new = z - alpha * delta
            if use_meh:
                kappa_new = kappa   # adaptive target, re-picked next iter
            else:
                centered = new_merit < jnp.maximum(
                    opts.center_frac * kappa, opts.r_tol)
                kappa_new = jnp.where(
                    centered,
                    jnp.maximum(kappa * opts.kappa_scale, kappa_final),
                    kappa)
            # stall recovery: a bad (e.g. carried) warm start can wedge the
            # line search at a wrong active set. Once per solve, reset the
            # cone variables to the canonical interior point (keeping the
            # configuration guess) and restart the central path.
            if has_cones:
                do_reinit = jnp.logical_and(stalled_new,
                                            jnp.logical_not(reinit_used))
                reset_mask, reset_tmpl = _cone_reset(spec, dtype)
                z_reinit = jnp.where(reset_mask, reset_tmpl, z_new)
                z_new = jnp.where(do_reinit, z_reinit, z_new)
                stalled_new = jnp.logical_and(stalled_new, reinit_used)
                reinit_used = jnp.logical_or(reinit_used, do_reinit)

            r0_new = residual_fn(z_new, theta, 0.0)
            if has_cones:
                _, kv_new = vio(r0_new)
                kappa_new = jnp.where(
                    do_reinit,
                    jnp.clip(kv_new, kappa_final, opts.kappa_init_max),
                    kappa_new)
            if opts.verbose:
                jax.debug.print(
                    "ip it={it} merit={m:.3e} alpha={a:.3e} kappa={k:.3e}",
                    it=it, m=new_merit, a=alpha, k=kappa_new)
            return (z_new, kappa_new, r0_new, it + 1, stalled_new,
                    reinit_used)

        init = (z0, kappa0.astype(dtype), r0_init, jnp.asarray(0, jnp.int32),
                jnp.asarray(False), jnp.asarray(False))
        z, kappa, r0, it, _, _ = jax.lax.while_loop(cond, body, init)
        rv, kv = vio(r0)
        return IPSolution(z=z, iterations=it, converged=converged(r0),
                          r_vio=rv, kappa_vio=kv)

    return solve


def make_solver_batched(residual_fn: Callable, spec: ConeSpec,
                        opts: IPOptions,
                        jacobian_fn: Callable | None = None) -> Callable:
    """Batched-native variant of ``make_solver``.

    ``solve(z0s (B, nz), thetas (B, ntheta)) -> IPSolution`` with batched
    fields. One ``lax.while_loop`` over the whole batch with per-lane
    convergence masking (the SURVEY build-plan's "batched early-exit via
    masking") instead of ``vmap``-of-``while_loop``: all per-lane math is
    plain vectorized ops, converged lanes freeze, the loop runs until
    every lane is done. Semantically identical to ``vmap(make_solver(...))``
    (tested); structurally friendlier to the TPU compiler and cheaper to
    trace (one solver body regardless of batch width).
    """
    spec.validate()
    if jacobian_fn is None:
        jacobian_fn = jax.jacfwd(lambda z, th: residual_fn(z, th, 0.0))

    has_cones = bool(spec.ort_prim) or bool(spec.soc_prim)
    kappa_final = opts.kappa_final_frac * opts.kappa_tol
    ls_exps = jnp.arange(opts.max_ls)
    use_meh = opts.mehrotra and has_cones
    n_cones = max(len(spec.ort_rows) + len(spec.soc_rows), 1)

    res_v = jax.vmap(residual_fn, in_axes=(0, 0, None))
    jac_v = jax.vmap(jacobian_fn)
    boundary_v = jax.vmap(lambda z, d: step_to_boundary(spec, z, d, tau=1.0))
    dprod_v = jax.vmap(lambda d: delta_products(spec, d))

    def solve(z0s: jnp.ndarray, thetas: jnp.ndarray) -> IPSolution:
        dtype = z0s.dtype
        B = z0s.shape[0]
        eq_mask, bil_mask, head_mask = _row_masks(spec, dtype)
        reset_mask, reset_tmpl = _cone_reset(spec, dtype)

        def vio(r0s):
            rv = jnp.max(jnp.abs(r0s) * eq_mask, axis=1)
            kv = (jnp.max(jnp.abs(r0s) * bil_mask, axis=1)
                  if has_cones else jnp.zeros(B, dtype))
            return rv, kv

        def merit(r0s, kappas):
            return jnp.max(jnp.abs(r0s - kappas[:, None] * head_mask),
                           axis=1)

        def converged(r0s):
            return merit(r0s, jnp.full((B,), kappa_final, dtype)) \
                < opts.r_tol

        r0s = res_v(z0s, thetas, 0.0)
        rv0, kv0 = vio(r0s)
        if has_cones:
            kappa_lo = max(kappa_final, opts.kappa_init_min)
            kappas0 = jnp.clip(kv0, kappa_lo, opts.kappa_init_max)
        else:
            kappas0 = jnp.full((B,), kappa_final, dtype)

        def active_lanes(r0s, its, stalled):
            return jnp.logical_not(
                jnp.logical_or(converged(r0s),
                               jnp.logical_or(stalled,
                                              its >= opts.max_iter)))

        def cond(state):
            zs, kappas, r0s, its, stalled, reinit = state
            return jnp.any(active_lanes(r0s, its, stalled))

        def body(state):
            zs, kappas, r0s, its, stalled, reinit = state
            active = active_lanes(r0s, its, stalled)

            Js = jac_v(zs, thetas)
            if opts.gamma_reg > 0.0:
                Js = Js + (opts.gamma_reg * kappas)[:, None, None] \
                    * jnp.eye(spec.nz, dtype=dtype)[None]
            if use_meh:
                # see single-solver notes: adaptive monotone target
                # kappa = clip(max(sigma*mu, infeas_frac*|r_eq|), kf, kappa)
                # with an a_aff^2-damped corrector, off at the parking floor
                lu_piv = jax.scipy.linalg.lu_factor(Js)
                d_aff = jax.scipy.linalg.lu_solve(
                    lu_piv, r0s[..., None])[..., 0]
                a_aff = boundary_v(zs, d_aff)
                r_affs = res_v(zs - a_aff[:, None] * d_aff, thetas, 0.0)
                mus = jnp.sum(head_mask * r0s, axis=1) / n_cones
                mu_affs = jnp.maximum(
                    jnp.sum(head_mask * r_affs, axis=1) / n_cones, 0.0)
                sigmas = jnp.clip(
                    (mu_affs / jnp.maximum(mus, 1e-30)) ** 3, 0.0, 1.0)
                r_eqs = jnp.max(jnp.abs(r0s) * eq_mask, axis=1)
                descending = mus > 1.25 * kappa_final
                kappas = jnp.where(
                    descending,
                    jnp.clip(jnp.maximum(
                        sigmas * mus, opts.mehrotra_infeas_frac * r_eqs),
                        kappa_final, kappas),
                    kappa_final).astype(dtype)
                r_k = r0s - kappas[:, None] * head_mask
                merit_cur = jnp.max(jnp.abs(r_k), axis=1)
                corr = jnp.where(descending[:, None],
                                 (a_aff * a_aff)[:, None] * dprod_v(d_aff),
                                 0.0)
                deltas = jax.scipy.linalg.lu_solve(
                    lu_piv, (r_k + corr)[..., None])[..., 0]
            else:
                r_k = r0s - kappas[:, None] * head_mask
                merit_cur = jnp.max(jnp.abs(r_k), axis=1)
                deltas = batched_newton_solve(Js, r_k[..., None])[..., 0]

            taus = jnp.clip(1.0 - merit_cur, opts.tau_min, opts.tau_max)
            alpha0 = jnp.minimum(boundary_v(zs, deltas) * taus, 1.0)

            alphas = alpha0[:, None] * (0.5 ** ls_exps)[None, :].astype(dtype)
            # (B, L, nz) candidates -> merits
            zc = zs[:, None, :] - alphas[..., None] * deltas[:, None, :]
            rc = jax.vmap(lambda zrow, th: jax.vmap(
                lambda z: residual_fn(z, th, 0.0))(zrow))(zc, thetas)
            mc = jnp.max(jnp.abs(rc - kappas[:, None, None] * head_mask),
                         axis=2)
            improves = mc < merit_cur[:, None]
            any_improve = jnp.any(improves, axis=1)
            first = jnp.argmax(improves, axis=1)
            best = jnp.argmin(mc, axis=1)
            pick = jnp.where(any_improve, first, best)
            sel = jnp.arange(B)
            alpha = alphas[sel, pick]
            new_merit = mc[sel, pick]
            stalled_new = jnp.logical_not(any_improve)

            zs_new = zs - alpha[:, None] * deltas
            if use_meh:
                kappas_new = kappas   # adaptive target, re-picked next iter
            else:
                centered = new_merit < jnp.maximum(
                    opts.center_frac * kappas, opts.r_tol)
                kappas_new = jnp.where(
                    centered,
                    jnp.maximum(kappas * opts.kappa_scale, kappa_final),
                    kappas)

            if has_cones:
                do_reinit = jnp.logical_and(stalled_new,
                                            jnp.logical_not(reinit))
                z_reset = jnp.where(reset_mask[None], reset_tmpl[None],
                                    zs_new)
                zs_new = jnp.where(do_reinit[:, None], z_reset, zs_new)
                stalled_new = jnp.logical_and(stalled_new, reinit)
                reinit = jnp.logical_or(reinit, do_reinit)

            # freeze inactive lanes
            zs_new = jnp.where(active[:, None], zs_new, zs)
            kappas_new = jnp.where(active, kappas_new, kappas)
            stalled = jnp.where(active, stalled_new, stalled)

            r0s_new = res_v(zs_new, thetas, 0.0)
            if has_cones:
                _, kv_new = vio(r0s_new)
                kappas_new = jnp.where(
                    jnp.logical_and(active, do_reinit),
                    jnp.clip(kv_new, max(kappa_final, opts.kappa_init_min),
                             opts.kappa_init_max),
                    kappas_new)
            its = its + active.astype(jnp.int32)
            return (zs_new, kappas_new, r0s_new, its, stalled, reinit)

        state = (z0s, kappas0.astype(dtype), r0s,
                 jnp.zeros(B, jnp.int32),
                 jnp.zeros(B, bool), jnp.zeros(B, bool))
        zs, kappas, r0s, its, _, _ = jax.lax.while_loop(cond, body, state)
        rv, kv = vio(r0s)
        return IPSolution(z=zs, iterations=its, converged=converged(r0s),
                          r_vio=rv, kappa_vio=kv)

    return solve


def make_sensitivity(residual_fn: Callable, spec: ConeSpec,
                     jacobian_fn: Callable | None = None,
                     jacobian_theta_fn: Callable | None = None) -> Callable:
    """Build ``sens(z, theta) -> dz/dtheta`` via the IFT.

    Evaluated at a (possibly kappa-relaxed) solution ``z``:
    ``dz = -(dr/dz)^{-1} dr/dtheta`` — the reference's ``ip.delta_z``
    (/root/reference/src/models/rocket/dynamics.jl:144). The bilinear rows'
    kappa offset is constant, so the Jacobians are kappa-independent.
    """
    if jacobian_fn is None:
        jacobian_fn = jax.jacfwd(lambda z, th: residual_fn(z, th, 0.0))
    if jacobian_theta_fn is None:
        jacobian_theta_fn = jax.jacfwd(
            lambda z, th: residual_fn(z, th, 0.0), argnums=1)

    def sens(z: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
        rz = jacobian_fn(z, theta)
        rth = jacobian_theta_fn(z, theta)
        return -jnp.linalg.solve(rz, rth)

    return sens


def make_sensitivity_batched(residual_fn: Callable, spec: ConeSpec,
                             jacobian_fn: Callable | None = None,
                             jacobian_theta_fn: Callable | None = None
                             ) -> Callable:
    """Lane-batched IFT sensitivities: ``sens(zs, thetas) -> (B, nz,
    ntheta)`` with the multi-RHS solve routed through
    ``batched_newton_solve`` (fused Pallas QR kernel when enabled)."""
    if jacobian_fn is None:
        jacobian_fn = jax.jacfwd(lambda z, th: residual_fn(z, th, 0.0))
    if jacobian_theta_fn is None:
        jacobian_theta_fn = jax.jacfwd(
            lambda z, th: residual_fn(z, th, 0.0), argnums=1)

    def sens(zs: jnp.ndarray, thetas: jnp.ndarray) -> jnp.ndarray:
        rzs = jax.vmap(jacobian_fn)(zs, thetas)
        rths = jax.vmap(jacobian_theta_fn)(zs, thetas)
        return -batched_newton_solve(rzs, rths)

    return sens
