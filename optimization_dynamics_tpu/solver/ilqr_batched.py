"""Batched-native AL-iLQR: lockstep scenario batches, no vmap-of-while.

``solve_batched`` runs B scenario solves as ONE program whose loops are
shared and whose state is lane-masked (the same design as
``make_solver_batched``): every ``while_loop`` advances all unconverged
lanes together, converged lanes freeze, and the embedded interior-point
solves run through the batched-native solver (scan-of-batched-while, no
``vmap`` around any ``while_loop``). The line search evaluates the whole
(lane x alpha) grid as one batched rollout and picks per-lane step sizes.

Trade-offs vs ``vmap(solve)``: iteration scheduling is lockstep (a slow
lane extends wall time for the batch — same as vmap), and per-lane
solutions are identical to the scalar solver up to line-search tie-breaks.
Structurally this compiles one solver body regardless of batch width and
avoids the vmap-of-while pattern entirely (docs/DESIGN.md §6).

Requires ``prob.dynamics_batched`` ((t, xs, us) -> ys) and
``prob.dynamics_jac_batched``; cost/constraint callables are the scalar
ones (vmapped internally — they contain no control flow).

The phase functions (open/closed-loop rollouts, derivative sweep, Riccati
backward pass, grid line search, AL bookkeeping) are built by
``make_phases`` so the segmented executor (``ilqr_segmented.py``) can jit
them as separate device programs with identical semantics.
"""

from __future__ import annotations

import math
from types import SimpleNamespace
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from optimization_dynamics_tpu.solver.ilqr import (
    ILQROptions,
    ILQRProblem,
    ILQRResult,
    _make_al_costs,
    _al_multiplier,
    _violation,
)

__all__ = ["solve_batched", "make_phases"]


def _pad_masks(prob: ILQRProblem) -> ILQRProblem:
    T, nu = prob.T, prob.nu
    ncon, nconT = prob.ncon, prob.nconT
    return prob._replace(
        ineq_mask=(jnp.zeros((T - 1, max(ncon, 1)), bool)
                   if prob.ineq_mask is None else prob.ineq_mask),
        terminal_ineq_mask=(jnp.zeros(max(nconT, 1), bool)
                            if prob.terminal_ineq_mask is None
                            else prob.terminal_ineq_mask),
        u_mask=(jnp.ones((T - 1, nu), bool)
                if prob.u_mask is None else prob.u_mask),
    )


def make_phases(prob: ILQRProblem, opts: ILQROptions, B: int,
                dtype) -> SimpleNamespace:
    """Build the batched AL-iLQR phase functions for batch width B.

    Each returned function is a pure, jit-safe device program over
    lane-batched arrays; ``solve_batched`` composes them inside
    ``while_loop``s, the segmented executor jits them individually.
    """
    # static copy of the control mask BEFORE padding: under jit,
    # _pad_masks' jnp.ones is a tracer, but the Pallas Riccati kernel
    # needs the mask at trace time (it is compile-time static by design)
    u_mask_np = (np.ones((prob.T - 1, prob.nu), bool)
                 if prob.u_mask is None else np.asarray(prob.u_mask))
    prob = _pad_masks(prob)
    T, nx, nu = prob.T, prob.nx, prob.nu
    ts = jnp.arange(T - 1)
    stage_al, terminal_al, stage_exp, terminal_exp = _make_al_costs(prob)

    stage_al_v = jax.vmap(stage_al, in_axes=(None, 0, 0, 0, 0))
    terminal_al_v = jax.vmap(terminal_al, in_axes=(0, 0, 0))

    # same-timestep warm starts (the batched dynamics_ws): line-search
    # rollouts and derivative sweeps re-solve each timestep's IP problem
    # from the previous accepted trajectory's solver variables —
    # measured ~1 Newton iteration warm vs ~20 cold
    has_bws = (prob.dynamics_batched_ws is not None
               and prob.ws_init_batched is not None)
    # cross-time carry: warm-start step t from the SAME rollout's step
    # t-1 solution (branch-safe: same trajectory, slowly-varying states;
    # docs/DESIGN.md §3). Only active when accepted-trajectory warm
    # starts are off.
    ws_carry = has_bws and prob.ws_carry and not prob.ws_linesearch

    def rollout_open(x0s, uss):
        """Open-loop rollout; with warm starts also returns the per-step
        solver variables ``wss (B, T-1, nws)`` seeding the first sweep.

        ``ws_carry`` threads the previous timestep's solver variables
        through the scan carry; when off, the carry is just the state —
        same traced program (and compile-cache key) as before the flag
        existed."""
        def f(carry, tu):
            xs, ws_prev = carry if ws_carry else (carry, None)
            t, us = tu
            if has_bws:
                ws0 = (ws_prev if ws_carry
                       else prob.ws_init_batched(t, xs, us))
                ys, ws = prob.dynamics_batched_ws(t, xs, us, ws0)
            else:
                ys = prob.dynamics_batched(t, xs, us)
                ws = jnp.zeros((xs.shape[0], 1), xs.dtype)
            return ((ys, ws) if ws_carry else ys), (ys, ws)

        init = ((x0s, prob.ws_init_batched(0, x0s, uss[:, 0]))
                if ws_carry else x0s)
        _, (yss, wss) = jax.lax.scan(f, init,
                                     (ts, jnp.swapaxes(uss, 0, 1)))
        xss = jnp.concatenate([x0s[:, None], jnp.swapaxes(yss, 0, 1)],
                              axis=1)
        return xss, jnp.swapaxes(wss, 0, 1)

    def traj_cost(xss, uss, lams, lamTs, rhos):
        def per_t(t):
            return stage_al_v(t, xss[:, t], uss[:, t], lams[:, t], rhos)
        Js = jax.vmap(per_t)(ts)                 # (T-1, B)
        return jnp.sum(Js, axis=0) + terminal_al_v(xss[:, -1], lamTs, rhos)

    def closed_loop(xss_ref, uss_ref, Kss, kss, alphas, lams, lamTs, rhos,
                    wss):
        """alphas: (B,). Returns xss, uss, Js, wss_new."""
        def f(carry, inp):
            if ws_carry:
                xs, Js, ws_prev = carry
            else:
                xs, Js = carry
                ws_prev = None
            t, xs_ref_t, us_ref_t, Ks_t, ks_t, ws_t = inp
            us = (us_ref_t + alphas[:, None] * ks_t
                  + jnp.einsum("bij,bj->bi", Ks_t, xs - xs_ref_t))
            us = jnp.where(prob.u_mask[t][None], us, us_ref_t)
            Js = Js + stage_al_v(t, xs, us, lams[:, t], rhos)
            if has_bws:
                if prob.ws_linesearch:
                    ws0 = ws_t
                elif ws_carry:
                    ws0 = ws_prev
                else:
                    ws0 = prob.ws_init_batched(t, xs, us)
                ys, ws_new = prob.dynamics_batched_ws(t, xs, us, ws0)
            else:
                ys = prob.dynamics_batched(t, xs, us)
                ws_new = ws_t
            new_carry = ((ys, Js, ws_new) if ws_carry else (ys, Js))
            return new_carry, (xs, us, ws_new)

        x0 = xss_ref[:, 0]
        J0 = jnp.zeros(xss_ref.shape[0], dtype)
        init = ((x0, J0, prob.ws_init_batched(0, x0, uss_ref[:, 0]))
                if ws_carry else (x0, J0))
        final, (xss, uss, wss_new) = jax.lax.scan(
            f, init,
            (ts, jnp.swapaxes(xss_ref[:, :-1], 0, 1),
             jnp.swapaxes(uss_ref, 0, 1),
             jnp.swapaxes(Kss, 0, 1), jnp.swapaxes(kss, 0, 1),
             jnp.swapaxes(wss, 0, 1)))
        xTs, Js = final[0], final[1]
        Js = Js + terminal_al_v(xTs, lamTs, rhos)
        xss = jnp.concatenate(
            [jnp.swapaxes(xss, 0, 1), xTs[:, None]], axis=1)
        return (xss, jnp.swapaxes(uss, 0, 1), Js,
                jnp.swapaxes(wss_new, 0, 1))

    # ------------------------------------------------------------------
    # Whole-rollout fused kernel (round 5): when the problem carries a
    # ``rollout_fused`` kernel (ops/pallas/fused_rollout.py), both
    # rollouts run as ONE Pallas launch — the round-4 budget measured
    # the scan-of-(kernel+glue) rollout at ~0.94 ms per 128-lane block
    # STEP with the kernel compute a small fraction of that; the fused
    # rollout pays the launch + glue once per rollout instead of once
    # per step. Costs are accumulated afterwards by ``traj_cost`` over
    # the returned trajectory (one vmapped program) — identical math to
    # the scan's in-carry accumulation.
    # ------------------------------------------------------------------
    if prob.rollout_fused is not None:
        assert not prob.ws_linesearch and not prob.ws_carry, (
            "rollout_fused implements the COLD line-search policy "
            "(per-step init_z warm starts); disable ws_linesearch/"
            "ws_carry")
        _fused_roll = prob.rollout_fused

        def closed_loop(xss_ref, uss_ref, Kss, kss, alphas, lams, lamTs,
                        rhos, wss):
            xss, uss, wss_new = _fused_roll(
                xss_ref[:, 0], xss_ref, uss_ref, Kss, kss, alphas)
            Js = traj_cost(xss, uss, lams, lamTs, rhos)
            return xss, uss, Js, wss_new

        def rollout_open(x0s, uss):
            Bw = x0s.shape[0]
            zeros = jnp.zeros
            xss, _, wss = _fused_roll(
                x0s, zeros((Bw, T, nx), x0s.dtype), uss,
                zeros((Bw, T - 1, nu, nx), x0s.dtype),
                zeros((Bw, T - 1, nu), x0s.dtype),
                zeros((Bw,), x0s.dtype))
            return xss, wss

    def derivatives(xss, uss, lams, lamTs, rhos, wss):
        flat_x = xss[:, :-1].reshape(B * (T - 1), nx)
        flat_u = uss.reshape(B * (T - 1), nu)
        flat_t = jnp.tile(ts, B)
        if has_bws and prob.dynamics_jac_batched_ws is not None:
            flat_w = wss.reshape(B * (T - 1), -1)
            _, fxs, fus, _ = prob.dynamics_jac_batched_ws(
                flat_t, flat_x, flat_u, flat_w)
        elif prob.dynamics_jac_batched is not None:
            _, fxs, fus = prob.dynamics_jac_batched(flat_t, flat_x, flat_u)
        else:
            _, fxs, fus = jax.vmap(prob.dynamics_jac)(flat_t, flat_x,
                                                      flat_u)
        fxs = fxs.reshape(B, T - 1, nx, nx)
        fus = fus.reshape(B, T - 1, nx, nu)

        def exp_t(t):
            return jax.vmap(stage_exp, in_axes=(None, 0, 0, 0, 0))(
                t, xss[:, t], uss[:, t], lams[:, t], rhos)
        lxs, lus, lxxs, luus, luxs = jax.vmap(exp_t)(ts)
        # (T-1, B, ...) -> (B, T-1, ...)
        sw = lambda a: jnp.swapaxes(a, 0, 1)
        gTs, HTs = jax.vmap(terminal_exp)(xss[:, -1], lamTs, rhos)
        return (fxs, fus, sw(lxs), sw(lus), sw(lxxs), sw(luus), sw(luxs),
                gTs, HTs)

    def backward_xla(fxs, fus, lxs, lus, lxxs, luus, luxs, gTs, HTs, regs):
        """Per-lane Riccati via one reverse scan over batched tensors."""
        def step(carry, inp):
            Vx, Vxx = carry                       # (B, nx), (B, nx, nx)
            t, fx, fu, lx, lu, lxx, luu, lux = inp
            Qx = lx + jnp.einsum("bji,bj->bi", fx, Vx)
            Qu = lu + jnp.einsum("bji,bj->bi", fu, Vx)
            VF = jnp.einsum("bij,bjk->bik", Vxx, fx)
            Qxx = lxx + jnp.einsum("bji,bjk->bik", fx, VF)
            VFu = jnp.einsum("bij,bjk->bik", Vxx, fu)
            Quu = luu + jnp.einsum("bji,bjk->bik", fu, VFu)
            Qux = lux + jnp.einsum("bji,bjk->bik", fu, VF)

            m = prob.u_mask[t]
            Qu = jnp.where(m[None], Qu, 0.0)
            Qux = jnp.where(m[None, :, None], Qux, 0.0)
            mm = jnp.outer(m, m)[None]
            Quu = jnp.where(mm, Quu, 0.0) + jax.vmap(jnp.diag)(
                jnp.where(m[None], regs[:, None], 1.0))

            chol = jnp.linalg.cholesky(Quu)
            ok = jnp.all(jnp.isfinite(chol), axis=(1, 2))
            rhs = jnp.concatenate([Qu[..., None], Qux], axis=2)
            sol = jax.vmap(
                lambda c, r: jax.scipy.linalg.cho_solve((c, True), r))(
                    chol, rhs)
            k = -sol[:, :, 0]
            K = -sol[:, :, 1:]

            Vx_new = (Qx + jnp.einsum("bji,bj->bi", K, Qu)
                      + jnp.einsum("bji,bj->bi", Qux, k)
                      + jnp.einsum("bji,bjk,bk->bi", K, Quu, k))
            KQ = jnp.einsum("bji,bjk->bik", K, Qux)
            Vxx_new = (Qxx + KQ + jnp.swapaxes(KQ, 1, 2)
                       + jnp.einsum("bji,bjk,bkl->bil", K, Quu, K))
            Vxx_new = 0.5 * (Vxx_new + jnp.swapaxes(Vxx_new, 1, 2))
            dV1 = jnp.einsum("bi,bi->b", k, Qu)
            dV2 = 0.5 * jnp.einsum("bi,bij,bj->b", k, Quu, k)
            qu_inf = jnp.max(jnp.abs(Qu), axis=1)
            return (Vx_new, Vxx_new), (K, k, dV1, dV2, qu_inf, ok)

        (_, _), (Ks, ks, dV1s, dV2s, qu_infs, oks) = jax.lax.scan(
            step, (gTs, HTs),
            (ts, jnp.swapaxes(fxs, 0, 1), jnp.swapaxes(fus, 0, 1),
             jnp.swapaxes(lxs, 0, 1), jnp.swapaxes(lus, 0, 1),
             jnp.swapaxes(lxxs, 0, 1), jnp.swapaxes(luus, 0, 1),
             jnp.swapaxes(luxs, 0, 1)),
            reverse=True)
        sw = lambda a: jnp.swapaxes(a, 0, 1)
        return (sw(Ks), sw(ks), jnp.sum(dV1s, axis=0),
                jnp.sum(dV2s, axis=0), jnp.max(qu_infs, axis=0),
                jnp.all(oks, axis=0))

    if opts.pallas_riccati:
        from optimization_dynamics_tpu.ops.pallas.riccati import (
            make_riccati_backward)
        backward = make_riccati_backward(
            T, nx, nu, u_mask_np,
            interpret=jax.default_backend() == "cpu")
    else:
        backward = backward_xla

    n_alpha = int(math.ceil(math.log2(1.0 / opts.alpha_min))) + 1
    alpha_grid = (0.5 ** jnp.arange(n_alpha)).astype(dtype)

    def _make_line_search(grid):
        A = int(grid.shape[0])

        def line_search(xss, uss, Kss, kss, Js, dV1, dV2, lams, lamTs,
                        rhos, wss):
            """(lane x alpha) grid as one batched rollout of B*A lanes."""
            rep = lambda a: jnp.repeat(a, A, axis=0)
            alphas_flat = jnp.tile(grid, B)             # (B*A,)
            xss_c, uss_c, Js_c, wss_c = closed_loop(
                rep(xss), rep(uss), rep(Kss), rep(kss), alphas_flat,
                rep(lams), rep(lamTs), rep(rhos), rep(wss))
            Js_c = Js_c.reshape(B, A)
            expected = (grid[None] * dV1[:, None]
                        + grid[None] ** 2 * dV2[:, None])
            ok = jnp.logical_and(
                jnp.isfinite(Js_c),
                Js_c <= Js[:, None]
                + opts.armijo_c1 * jnp.minimum(expected, 0.0))
            accepted = jnp.any(ok, axis=1)
            pick = jnp.argmax(ok, axis=1)
            sel = jnp.arange(B) * A + pick
            return (xss_c[sel], uss_c[sel], Js_c[jnp.arange(B), pick],
                    accepted, wss_c[sel])

        return line_search

    line_search = _make_line_search(alpha_grid)
    # quick grid: the first two candidates. The full grid picks the
    # FIRST Armijo-passing alpha, so whenever every active lane accepts
    # within the quick grid the result is identical to the full grid —
    # the segmented executor exploits this (two-stage line search).
    line_search_quick = _make_line_search(alpha_grid[:min(2, n_alpha)])
    # mid grid: the first four candidates — the cascade's middle rung
    # (same first-accept identity argument as the quick grid; the
    # round-3 phase budget measured the 8-alpha rollout at 86% of a
    # full inner iteration, so accepting at alpha in {0.25, 0.125}
    # through a half-width grid saves ~43% of the dominant term)
    line_search_mid = _make_line_search(alpha_grid[:min(4, n_alpha)])

    def _make_inner_step(ls):
        def inner_step(xss, uss, Js, regs, lams, lamTs, rhos, active,
                       wss):
            """One iLQR iteration for every active lane; returns the
            updated (xss, uss, Js, regs, wss), the per-lane convergence
            signals, the backward-pass gradient norm |Qu|_inf, and
            ``ok_lanes`` (accepted-or-inactive — all-True means a quick
            pass needs no full-grid fallback)."""
            d = derivatives(xss, uss, lams, lamTs, rhos, wss)
            Kss, kss, dV1, dV2, qu_inf, bp_ok = backward(*d, regs)
            xss_n, uss_n, Js_n, accepted, wss_n = ls(
                xss, uss, Kss, kss, Js, dV1, dV2, lams, lamTs, rhos, wss)
            ls_failed = jnp.logical_not(jnp.logical_and(accepted, bp_ok))
            regs_n = jnp.where(
                ls_failed,
                jnp.minimum(regs * opts.reg_up, opts.reg_max),
                jnp.maximum(regs * opts.reg_down, opts.reg_min))
            keep = jnp.logical_or(ls_failed, jnp.logical_not(active))
            xss_n = jnp.where(keep[:, None, None], xss, xss_n)
            uss_n = jnp.where(keep[:, None, None], uss, uss_n)
            Js_n = jnp.where(keep, Js, Js_n)
            regs_n = jnp.where(active, regs_n, regs)
            wss_n = jnp.where(keep[:, None, None], wss, wss_n)

            grad_small = qu_inf < opts.grad_tol
            obj_small = jnp.abs(Js - Js_n) < opts.obj_tol
            reg_capped = regs_n >= opts.reg_max
            newly_done = jnp.logical_or(
                grad_small,
                jnp.logical_or(jnp.logical_and(accepted, obj_small),
                               jnp.logical_and(ls_failed, reg_capped)))
            ok_lanes = jnp.logical_or(jnp.logical_and(accepted, bp_ok),
                                      jnp.logical_not(active))
            return (xss_n, uss_n, Js_n, regs_n, wss_n, newly_done,
                    qu_inf, ok_lanes)

        return inner_step

    inner_step = _make_inner_step(line_search)
    inner_step_quick = _make_inner_step(line_search_quick)
    # None when the full grid is already <= 4 alphas (mid == full)
    inner_step_mid = (_make_inner_step(line_search_mid)
                      if n_alpha > 4 else None)

    # ------------------------------------------------------------------
    # Incremental line-search cascade (round 3, the k=1 deploy path).
    #
    # The probe-style two-stage/mid cascade above re-pays the derivative
    # sweep + backward pass on every fallback and rolls overlapping
    # alpha prefixes (quick {1,.5} -> mid {1,.5,.25,.125} -> full grid),
    # so at B=128 lockstep — where one rejecting lane fails a probe
    # nearly every iteration — it degenerates to the full grid 86% of
    # the time (BASELINE.md round-3 budget). The cascade below instead
    # (a) computes gains ONCE per iteration (``ls_prep``), then
    # (b) rolls DISJOINT alpha slices {1,.5} -> {.25,.125} -> {rest},
    # merging each lane's FIRST accept across rungs (``ls_rung``), and
    # (c) applies the standard accept/reject bookkeeping (``ls_apply``).
    # Since the slices partition the grid in order and each lane keeps
    # its first-accepting alpha, the merged pick is exactly the full
    # grid's first-passing alpha — decision-identical — while the
    # worst-case rollout work equals ONE full grid (vs probe+grid
    # before) and an iteration whose deepest-rejecting lane accepts
    # within the first 2 (or 4) alphas costs only that slice.
    # ------------------------------------------------------------------
    ls_slice_bounds = [b for b in (0, 2, 4, n_alpha)
                       if b <= n_alpha]
    ls_slice_bounds = sorted(set(ls_slice_bounds))
    ls_slices = [_make_line_search(alpha_grid[lo:hi])
                 for lo, hi in zip(ls_slice_bounds[:-1],
                                   ls_slice_bounds[1:])]

    def ls_prep(xss, uss, Js, regs, lams, lamTs, rhos, active, wss):
        """Derivative sweep + backward pass + the FIRST alpha slice.

        Returns the gains (reused by the later rungs), the backward-pass
        convergence signals, the candidate accumulator after slice 0,
        and ``covered`` (every active lane already accepted)."""
        d = derivatives(xss, uss, lams, lamTs, rhos, wss)
        Kss, kss, dV1, dV2, qu_inf, bp_ok = backward(*d, regs)
        cand = ls_slices[0](xss, uss, Kss, kss, Js, dV1, dV2, lams,
                            lamTs, rhos, wss)
        covered = jnp.all(jnp.logical_or(cand[3],
                                         jnp.logical_not(active)))
        return Kss, kss, dV1, dV2, qu_inf, bp_ok, cand, covered

    def _make_ls_rung(i):
        ls = ls_slices[i]

        def ls_rung(xss, uss, Kss, kss, Js, dV1, dV2, lams, lamTs, rhos,
                    wss, cand, active):
            """Roll slice ``i`` and merge first-accepts into ``cand``."""
            xs_c, us_c, J_c, acc_c, ws_c = ls(
                xss, uss, Kss, kss, Js, dV1, dV2, lams, lamTs, rhos, wss)
            xs_b, us_b, J_b, acc_b, ws_b = cand
            take = jnp.logical_and(acc_c, jnp.logical_not(acc_b))
            xs_b = jnp.where(take[:, None, None], xs_c, xs_b)
            us_b = jnp.where(take[:, None, None], us_c, us_b)
            J_b = jnp.where(take, J_c, J_b)
            ws_b = jnp.where(take[:, None, None], ws_c, ws_b)
            acc_b = jnp.logical_or(acc_b, acc_c)
            covered = jnp.all(jnp.logical_or(acc_b,
                                             jnp.logical_not(active)))
            return (xs_b, us_b, J_b, acc_b, ws_b), covered

        return ls_rung

    ls_rungs = [_make_ls_rung(i) for i in range(1, len(ls_slices))]

    # ------------------------------------------------------------------
    # Per-lane adaptive step-size line search (round 4).
    #
    # The cascade above still rolls lockstep alpha SLICES: one deep-
    # rejecting lane forces every active lane through the full grid
    # (round-3 budget: ~85% of iterations reached full depth, line-search
    # rollouts 86% of iteration wall). The adaptive path instead rolls
    # ONE alpha per lane per rung — each lane starts at the alpha it
    # accepted last iteration (host-remembered index, growing one grid
    # notch toward 1.0 after every accept) and backtracks down the grid
    # only on reject, wrapping to the untried larger alphas afterwards so
    # the candidate SET equals the full grid's. A well-behaved lane pays
    # 1 rollout/iteration instead of 8; the candidate order is per-lane
    # (not the reference's always-from-1.0 first-accept), which changes
    # step-size picks but not the Armijo acceptance criterion — the
    # deploy A/B gates convergence + objective parity (bench.py).
    # ``ls_rung_at`` is ONE program reused for every rung (the alpha
    # indices are an input), so the adaptive cascade needs fewer
    # compiled phase programs than the slice cascade.
    # ------------------------------------------------------------------
    def _line_search_at(xss, uss, Kss, kss, Js, dV1, dV2, lams, lamTs,
                        rhos, wss, ais):
        """One rollout at per-lane alphas ``alpha_grid[ais]``."""
        alphas = alpha_grid[ais]
        xss_c, uss_c, Js_c, wss_c = closed_loop(
            xss, uss, Kss, kss, alphas, lams, lamTs, rhos, wss)
        expected = alphas * dV1 + alphas ** 2 * dV2
        ok = jnp.logical_and(
            jnp.isfinite(Js_c),
            Js_c <= Js + opts.armijo_c1 * jnp.minimum(expected, 0.0))
        return xss_c, uss_c, Js_c, ok, wss_c

    def ls_rung_at(xss, uss, Kss, kss, Js, dV1, dV2, lams, lamTs, rhos,
                   wss, cand, active, ais):
        """Roll per-lane alphas ``ais`` and merge first-accepts."""
        xs_c, us_c, J_c, acc_c, ws_c = _line_search_at(
            xss, uss, Kss, kss, Js, dV1, dV2, lams, lamTs, rhos, wss,
            ais)
        xs_b, us_b, J_b, acc_b, ws_b = cand
        take = jnp.logical_and(acc_c, jnp.logical_not(acc_b))
        xs_b = jnp.where(take[:, None, None], xs_c, xs_b)
        us_b = jnp.where(take[:, None, None], us_c, us_b)
        J_b = jnp.where(take, J_c, J_b)
        ws_b = jnp.where(take[:, None, None], ws_c, ws_b)
        acc_b = jnp.logical_or(acc_b, acc_c)
        covered = jnp.all(jnp.logical_or(acc_b, jnp.logical_not(active)))
        return (xs_b, us_b, J_b, acc_b, ws_b), covered

    def ls_prep_at(xss, uss, Js, regs, lams, lamTs, rhos, active, wss,
                   ais):
        """Derivative sweep + backward pass + the first ADAPTIVE rung
        (each lane at its remembered alpha index ``ais``)."""
        d = derivatives(xss, uss, lams, lamTs, rhos, wss)
        Kss, kss, dV1, dV2, qu_inf, bp_ok = backward(*d, regs)
        cand0 = (xss, uss, Js, jnp.zeros(xss.shape[0], bool), wss)
        cand, covered = ls_rung_at(
            xss, uss, Kss, kss, Js, dV1, dV2, lams, lamTs, rhos, wss,
            cand0, active, ais)
        return Kss, kss, dV1, dV2, qu_inf, bp_ok, cand, covered

    # ------------------------------------------------------------------
    # Device-resident adaptive inner step (round 4, second iteration).
    #
    # The HOST-driven per-lane rungs above measured SLOWER on-chip than
    # the slice cascade despite 2.2x less rollout compute (bench r4
    # run 1: 814 ms/iteration vs 446) — each sequential rung pays a
    # dispatch + host-sync round-trip (~45 ms) and, at the knife edge,
    # ~86% of iterations still reach full backtracking depth, so depth
    # serialization dominates. This program keeps the WHOLE iteration
    # on-device, one dispatch, and attacks depth with alpha MEMORY:
    #
    #   rung 0 rolls a per-lane TWO-alpha window {1.0, alpha_mem} as
    #   one 2B-lane batched rollout (alpha=1 is ALWAYS tried, which
    #   keeps the obj_tol done-criterion honest — a small remembered
    #   step can only be accepted after alpha=1 rejected, the same
    #   evidence the reference's always-from-1 grid produces);
    #   a lax.while_loop then rolls ONE further per-lane candidate at a
    #   time (grid order, skipping the two already tried) only while
    #   some active lane has no accept — most iterations never enter it
    #   once the memory has settled. Accepted lanes remember
    #   max(index - 1, 1) (one notch back toward 1.0 per accept).
    #
    # NOT decision-identical to the reference grid: indices strictly
    # between 1.0 and alpha_mem are tried only in the fallback loop, so
    # a lane can step smaller than the grid's first-passing alpha. The
    # acceptance criterion (Armijo) and the stopping rules are
    # unchanged; deploy A/Bs gate convergence + objective parity.
    # ------------------------------------------------------------------
    def inner_step_adaptive(xss, uss, Js, regs, lams, lamTs, rhos,
                            active, wss, ais):
        """One iteration, one dispatch. ``ais (B,) int32`` in
        ``[1, n_alpha-1]``. Returns the ``inner_step`` outputs plus
        ``ais_next`` and ``depth`` (1 + fallback rungs executed)."""
        Bw = xss.shape[0]
        ais = jnp.clip(ais, 1, n_alpha - 1)
        d = derivatives(xss, uss, lams, lamTs, rhos, wss)
        Kss, kss, dV1, dV2, qu_inf, bp_ok = backward(*d, regs)

        # rung 0: per-lane window {index 0 (alpha=1), index ai} as ONE
        # 2B-lane rollout, lane-major so lane b occupies rows 2b, 2b+1
        idx2 = jnp.stack([jnp.zeros(Bw, jnp.int32), ais], 1).reshape(-1)
        alphas2 = alpha_grid[idx2]
        rep = lambda a: jnp.repeat(a, 2, axis=0)
        xs_c, us_c, J_c, ws_c = closed_loop(
            rep(xss), rep(uss), rep(Kss), rep(kss), alphas2,
            rep(lams), rep(lamTs), rep(rhos), rep(wss))
        exp2 = alphas2 * rep(dV1) + alphas2 ** 2 * rep(dV2)
        ok2 = jnp.logical_and(
            jnp.isfinite(J_c),
            J_c <= rep(Js) + opts.armijo_c1 * jnp.minimum(exp2, 0.0))
        ok2 = ok2.reshape(Bw, 2)
        # grid order: prefer alpha=1 over the remembered smaller alpha
        pick = jnp.where(ok2[:, 0], 0, 1)
        sel = jnp.arange(Bw) * 2 + pick
        accepted = jnp.any(ok2, axis=1)
        acc_idx = jnp.where(ok2[:, 0], 0, ais)
        cand = (xs_c[sel], us_c[sel], J_c.reshape(Bw, 2)[
            jnp.arange(Bw), pick], accepted, ws_c[sel], acc_idx)

        # fallback: one per-lane candidate per while-iteration, grid
        # order skipping {0, ai}: r-th fallback index = r if r < ai
        # else r + 1  (r = 1..n_alpha-2 covers the rest of the grid)
        def fb_cond(carry):
            r, cand = carry
            return jnp.logical_and(
                r <= n_alpha - 2,
                jnp.any(jnp.logical_and(active,
                                        jnp.logical_not(cand[3]))))

        def fb_body(carry):
            r, cand = carry
            f = jnp.where(r < ais, r, r + 1).astype(jnp.int32)
            alphas = alpha_grid[f]
            xs_c, us_c, J_c, ws_c = closed_loop(
                xss, uss, Kss, kss, alphas, lams, lamTs, rhos, wss)
            expd = alphas * dV1 + alphas ** 2 * dV2
            ok = jnp.logical_and(
                jnp.isfinite(J_c),
                J_c <= Js + opts.armijo_c1 * jnp.minimum(expd, 0.0))
            xs_b, us_b, J_b, acc_b, ws_b, ai_b = cand
            take = jnp.logical_and(ok, jnp.logical_not(acc_b))
            cand = (jnp.where(take[:, None, None], xs_c, xs_b),
                    jnp.where(take[:, None, None], us_c, us_b),
                    jnp.where(take, J_c, J_b),
                    jnp.logical_or(acc_b, ok),
                    jnp.where(take[:, None, None], ws_c, ws_b),
                    jnp.where(take, f, ai_b))
            return r + 1, cand

        rf, cand = jax.lax.while_loop(fb_cond, fb_body, (jnp.asarray(
            1, jnp.int32), cand))
        xss_n, uss_n, Js_n, accepted, wss_n, acc_idx = (
            cand[0], cand[1], cand[2], cand[3], cand[4], cand[5])

        ls_failed = jnp.logical_not(jnp.logical_and(accepted, bp_ok))
        regs_n = jnp.where(
            ls_failed,
            jnp.minimum(regs * opts.reg_up, opts.reg_max),
            jnp.maximum(regs * opts.reg_down, opts.reg_min))
        keep = jnp.logical_or(ls_failed, jnp.logical_not(active))
        xss_n = jnp.where(keep[:, None, None], xss, xss_n)
        uss_n = jnp.where(keep[:, None, None], uss, uss_n)
        Js_n = jnp.where(keep, Js, Js_n)
        regs_n = jnp.where(active, regs_n, regs)
        wss_n = jnp.where(keep[:, None, None], wss, wss_n)

        grad_small = qu_inf < opts.grad_tol
        obj_small = jnp.abs(Js - Js_n) < opts.obj_tol
        reg_capped = regs_n >= opts.reg_max
        newly_done = jnp.logical_or(
            grad_small,
            jnp.logical_or(jnp.logical_and(accepted, obj_small),
                           jnp.logical_and(ls_failed, reg_capped)))
        ok_lanes = jnp.logical_or(jnp.logical_and(accepted, bp_ok),
                                  jnp.logical_not(active))
        ais_next = jnp.where(
            jnp.logical_and(active, accepted),
            jnp.maximum(acc_idx - 1, 1), ais).astype(jnp.int32)
        return (xss_n, uss_n, Js_n, regs_n, wss_n, newly_done,
                qu_inf, ok_lanes, ais_next, rf)

    def ls_apply(xss, uss, Js, regs, wss, active, cand, qu_inf, bp_ok):
        """Accept/reject bookkeeping — the tail of ``inner_step`` with
        the merged cascade candidates standing in for the grid pick."""
        xss_n, uss_n, Js_n, accepted, wss_n = cand
        ls_failed = jnp.logical_not(jnp.logical_and(accepted, bp_ok))
        regs_n = jnp.where(
            ls_failed,
            jnp.minimum(regs * opts.reg_up, opts.reg_max),
            jnp.maximum(regs * opts.reg_down, opts.reg_min))
        keep = jnp.logical_or(ls_failed, jnp.logical_not(active))
        xss_n = jnp.where(keep[:, None, None], xss, xss_n)
        uss_n = jnp.where(keep[:, None, None], uss, uss_n)
        Js_n = jnp.where(keep, Js, Js_n)
        regs_n = jnp.where(active, regs_n, regs)
        wss_n = jnp.where(keep[:, None, None], wss, wss_n)

        grad_small = qu_inf < opts.grad_tol
        obj_small = jnp.abs(Js - Js_n) < opts.obj_tol
        reg_capped = regs_n >= opts.reg_max
        newly_done = jnp.logical_or(
            grad_small,
            jnp.logical_or(jnp.logical_and(accepted, obj_small),
                           jnp.logical_and(ls_failed, reg_capped)))
        ok_lanes = jnp.logical_or(jnp.logical_and(accepted, bp_ok),
                                  jnp.logical_not(active))
        return (xss_n, uss_n, Js_n, regs_n, wss_n, newly_done,
                qu_inf, ok_lanes)

    def make_inner_scan(k: int, two_stage: bool = True):
        """``k`` inner iterations as ONE device program (a ``lax.scan``
        of the two-stage inner step), amortizing the per-iteration
        host<->device dispatch of the segmented executor.

        Decision-identical to ``k`` host-driven two-stage iterations:
        the quick 2-alpha pass runs first and a ``lax.cond`` re-runs
        the full Armijo grid from the same state only when some active
        lane rejected both quick candidates (the full grid takes the
        FIRST passing alpha, so an all-accept quick pass already equals
        the full grid). Trajectories match the host loop up to XLA
        fusion-order rounding (~1e-15/iter; the fused scan contracts
        fma/reduction order differently from separately-compiled phase
        programs). Lanes that finish mid-chunk idle behind the
        ``active`` mask; an all-done chunk step skips the iteration
        body entirely.

        ``two_stage=False`` skips the quick pass and its ``lax.cond``
        entirely (every iteration runs the full Armijo grid) — the
        smaller program a caller who disabled ``two_stage_ls`` expects.
        """

        def inner_scan(xss, uss, Js, regs, lams, lamTs, rhos, active,
                       wss, its, gnorms, rit, budget):
            """``rit`` is the round-local iteration counter (the host
            passes zeros at the start of each AL round); together with
            ``budget`` (a traced scalar — this AL round's inner budget,
            ``opts.max_iter`` or the round's ``max_iter_schedule``
            entry) it enforces the per-round budget exactly as the
            host loop does, even when a k-chunk straddles the budget
            boundary — and without recompiling per schedule entry."""
            def body(carry, _):
                xss, uss, Js, regs, wss, active, its, gnorms, rit = carry

                def iterate(xss, uss, Js, regs, wss, active, its,
                            gnorms, rit):
                    if two_stage:
                        out_q = inner_step_quick(xss, uss, Js, regs, lams,
                                                 lamTs, rhos, active, wss)
                        out = jax.lax.cond(
                            jnp.all(out_q[7]),
                            lambda: out_q,
                            lambda: inner_step(xss, uss, Js, regs, lams,
                                               lamTs, rhos, active, wss))
                    else:
                        out = inner_step(xss, uss, Js, regs, lams,
                                         lamTs, rhos, active, wss)
                    (xss, uss, Js, regs, wss, newly_done, qu_inf,
                     _) = out
                    gnorms = jnp.where(active, qu_inf, gnorms)
                    its = its + active.astype(jnp.int32)
                    rit = rit + active.astype(jnp.int32)
                    active = jnp.logical_and(active,
                                             jnp.logical_not(newly_done))
                    active = jnp.logical_and(active, rit < budget)
                    return (xss, uss, Js, regs, wss, active, its,
                            gnorms, rit)

                new = jax.lax.cond(
                    jnp.any(active), iterate,
                    lambda *a: a,
                    xss, uss, Js, regs, wss, active, its, gnorms, rit)
                return new, None

            carry = (xss, uss, Js, regs, wss, active, its, gnorms, rit)
            carry, _ = jax.lax.scan(body, carry, None, length=k)
            return carry

        return inner_scan

    has_con = prob.stage_con is not None
    has_conT = prob.terminal_con is not None
    con_v = (jax.vmap(prob.stage_con, in_axes=(None, 0, 0))
             if has_con else None)
    conT_v = jax.vmap(prob.terminal_con) if has_conT else None

    def con_violation(xss, uss):
        v = jnp.zeros(B, dtype)
        if has_con:
            def per_t(t):
                c = con_v(t, xss[:, t], uss[:, t])
                return jnp.max(_violation(c, None, prob.ineq_mask[t][None]),
                               axis=1)
            v = jnp.maximum(v, jnp.max(jax.vmap(per_t)(ts), axis=0))
        if has_conT:
            cT = conT_v(xss[:, -1])
            v = jnp.maximum(v, jnp.max(
                _violation(cT, None, prob.terminal_ineq_mask[None]),
                axis=1))
        return v

    def dual_update(xss, uss, lams, lamTs, rhos):
        if has_con:
            def per_t(t):
                c = con_v(t, xss[:, t], uss[:, t])
                return _al_multiplier(c, lams[:, t], rhos[:, None],
                                      prob.ineq_mask[t][None])
            lams = jnp.clip(jnp.swapaxes(jax.vmap(per_t)(ts), 0, 1),
                            -opts.lambda_max, opts.lambda_max)
        if has_conT:
            cT = conT_v(xss[:, -1])
            lamTs = jnp.clip(
                _al_multiplier(cT, lamTs, rhos[:, None],
                               prob.terminal_ineq_mask[None]),
                -opts.lambda_max, opts.lambda_max)
        return lams, lamTs

    def smooth_cost(xss, uss):
        def one(xs, us):
            Js = jax.vmap(prob.stage_cost)(ts, xs[:-1], us)
            return jnp.sum(Js) + prob.terminal_cost(xs[-1])
        return jax.vmap(one)(xss, uss)

    return SimpleNamespace(
        prob=prob, B=B, T=T, nx=nx, nu=nu, dtype=dtype,
        has_con=has_con, has_conT=has_conT,
        rollout_open=rollout_open, traj_cost=traj_cost,
        closed_loop=closed_loop, derivatives=derivatives,
        backward=backward, backward_xla=backward_xla,
        line_search=line_search, inner_step=inner_step,
        inner_step_quick=inner_step_quick,
        inner_step_mid=inner_step_mid,
        ls_prep=ls_prep, ls_rungs=ls_rungs, ls_apply=ls_apply,
        ls_prep_at=ls_prep_at, ls_rung_at=ls_rung_at,
        inner_step_adaptive=inner_step_adaptive,
        n_alpha=n_alpha,
        # alphas rolled by slice0 and each cascade rung (the segmented
        # executor's dispatch accounting uses these)
        ls_slice_widths=[hi - lo for lo, hi in zip(ls_slice_bounds[:-1],
                                                   ls_slice_bounds[1:])],
        make_inner_scan=make_inner_scan,
        con_violation=con_violation, dual_update=dual_update,
        smooth_cost=smooth_cost)


def solve_batched(prob: ILQRProblem, x0s: jnp.ndarray,
                  us_init: jnp.ndarray,
                  opts: ILQROptions = ILQROptions(),
                  lam_init: jnp.ndarray | None = None,
                  lamT_init: jnp.ndarray | None = None,
                  rho_init: jnp.ndarray | None = None) -> ILQRResult:
    """x0s: (B, nx); us_init: (B, T-1, nu) or (T-1, nu) shared.

    ``lam_init (B, T-1, ncon)`` / ``lamT_init (B, nconT)`` /
    ``rho_init (B,)`` warm-start the per-lane AL state from a previous
    solve's ``ILQRResult.lam/lamT/rho`` (sweep retries, re-solves)."""
    assert prob.dynamics_batched is not None, "needs dynamics_batched"
    T, nu = prob.T, prob.nu
    ncon, nconT = prob.ncon, prob.nconT
    dtype = x0s.dtype
    B = x0s.shape[0]
    if us_init.ndim == 2:
        us_init = jnp.broadcast_to(us_init[None], (B, T - 1, nu))

    ph = make_phases(prob, opts, B, dtype)

    def inner(xss, uss, wss, lams, lamTs, rhos, act_al):
        def cond(s):
            xss, uss, Js, regs, wss, it, done, gnorms = s
            return jnp.any(jnp.logical_and(
                jnp.logical_not(done), it < opts.max_iter))

        def body(s):
            xss, uss, Js, regs, wss, it, done, gnorms = s
            active = jnp.logical_and(jnp.logical_not(done),
                                     jnp.logical_and(act_al,
                                                     it < opts.max_iter))
            (xss_n, uss_n, Js_n, regs_n, wss_n, newly_done,
             qu_inf, _) = ph.inner_step(
                xss, uss, Js, regs, lams, lamTs, rhos, active, wss)
            gnorms = jnp.where(active, qu_inf, gnorms)
            done_n = jnp.logical_or(done, newly_done)
            it_n = it + active.astype(jnp.int32)
            return (xss_n, uss_n, Js_n, regs_n, wss_n, it_n, done_n,
                    gnorms)

        Js0 = ph.traj_cost(xss, uss, lams, lamTs, rhos)
        state = (xss, uss, Js0, jnp.full(B, opts.reg_init, dtype), wss,
                 jnp.zeros(B, jnp.int32),
                 jnp.logical_not(act_al), jnp.full(B, jnp.inf, dtype))
        xss, uss, Js, regs, wss, its, _, gnorms = jax.lax.while_loop(
            cond, body, state)
        return xss, uss, wss, Js, its, gnorms

    xss0, wss0 = ph.rollout_open(x0s, us_init)
    lams0 = (jnp.zeros((B, T - 1, max(ncon, 1)), dtype)
             if lam_init is None else jnp.asarray(lam_init, dtype))
    lamTs0 = (jnp.zeros((B, max(nconT, 1)), dtype)
              if lamT_init is None else jnp.asarray(lamT_init, dtype))
    rhos0 = (jnp.full(B, opts.rho_init, dtype) if rho_init is None
             else jnp.broadcast_to(jnp.asarray(rho_init, dtype), (B,)))

    def al_cond(s):
        xss, uss, wss, lams, lamTs, rhos, its, al_it, vio, gnorms = s
        return jnp.logical_and(
            al_it < opts.max_al_iter,
            jnp.any(jnp.logical_not(vio < opts.con_tol)))

    def al_body(s):
        xss, uss, wss, lams, lamTs, rhos, its, al_it, vio, gnorms = s
        act = jnp.logical_not(vio < opts.con_tol)
        xss, uss, wss, Js, inner_its, gn = inner(xss, uss, wss, lams,
                                                 lamTs, rhos, act)
        gnorms = jnp.where(act, gn, gnorms)
        its = its + inner_its
        vio_n = ph.con_violation(xss, uss)
        vio = jnp.where(act, vio_n, vio)
        lams_n, lamTs_n = ph.dual_update(xss, uss, lams, lamTs, rhos)
        lams = jnp.where(act[:, None, None], lams_n, lams)
        lamTs = jnp.where(act[:, None], lamTs_n, lamTs)
        rhos = jnp.where(act, jnp.minimum(rhos * opts.rho_scale, opts.rho_max), rhos)
        return (xss, uss, wss, lams, lamTs, rhos, its, al_it + 1, vio,
                gnorms)

    state = (xss0, us_init, wss0, lams0, lamTs0, rhos0,
             jnp.zeros(B, jnp.int32), jnp.asarray(0, jnp.int32),
             jnp.full(B, jnp.inf, dtype), jnp.full(B, jnp.inf, dtype))
    if ph.has_con or ph.has_conT:
        (xss, uss, wss, lams, lamTs, rhos, its, al_it,
         vio, gnorms) = jax.lax.while_loop(al_cond, al_body, state)
    else:
        act = jnp.ones(B, bool)
        xss, uss, wss, Js, its, gnorms = inner(xss0, us_init, wss0, lams0,
                                               lamTs0, rhos0, act)
        lams, lamTs, rhos = lams0, lamTs0, rhos0
        al_it = jnp.asarray(1, jnp.int32)
        vio = jnp.zeros(B, dtype)

    al_obj = ph.traj_cost(xss, uss, lams, lamTs, rhos)
    obj = ph.smooth_cost(xss, uss)
    return ILQRResult(
        xs=xss, us=uss, objective=obj, al_objective=al_obj,
        iterations=its,
        al_iterations=jnp.full(B, al_it, jnp.int32),
        constraint_violation=vio,
        gradient_norm=gnorms,
        converged=vio < opts.con_tol,
        lam=lams, lamT=lamTs, rho=rhos)
