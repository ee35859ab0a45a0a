"""Constrained iterative LQR (augmented Lagrangian) — TPU-native.

Re-design of the reference's outer engine ``IterativeLQR.jl`` (behavior
pinned by call sites, SURVEY.md §2.4; options at
/root/reference/examples/cartpole.jl:85-94):

  * inner loop: derivative sweep (vmapped over the horizon — every
    timestep's implicit-dynamics solve and cost/constraint expansion runs
    in parallel on-chip), regularized Riccati backward pass (reverse
    ``lax.scan``), Armijo-line-searched nonlinear forward rollout
    (``lax.scan`` inside a ``while_loop`` over step sizes);
  * outer loop: augmented-Lagrangian dual updates and penalty scaling
    until the constraint tolerance is met.

Everything is a single traced XLA program: ``solve`` jits once and vmaps
over scenario batches (initial states, goals, model parameters via
problem closures).

Structural conventions (fixed shapes, mask-based ragged support):

  * horizon ``T`` states ``(T, nx)``, controls ``(T-1, nu)``;
  * stage functions take ``(t, x, u)`` with ``t`` a traced index — stage
    heterogeneity (e.g. the hopper's state-augmented first step,
    /root/reference/examples/hopper.jl:52-162) is expressed with
    ``lax.cond``/``switch`` on ``t`` and dimension padding;
  * ``u_mask[t]`` marks active control dims per stage (padded dims get
    unit diagonal in Quu and zero gains);
  * inequality constraint rows are marked by ``ineq_mask``; equality rows
    elsewhere. AL uses the Powell-Hestenes-Rockafellar form.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ["ILQROptions", "ILQRProblem", "ILQRResult", "solve", "rollout"]


@dataclasses.dataclass(frozen=True)
class ILQROptions:
    """Options; names follow ``iLQR.Options``
    (/root/reference/examples/cartpole.jl:85-94)."""

    alpha_min: float = 1.0e-5
    obj_tol: float = 1.0e-5
    grad_tol: float = 1.0e-3
    max_iter: int = 100
    max_al_iter: int = 20
    con_tol: float = 0.005
    rho_init: float = 1.0
    rho_scale: float = 10.0
    # cap on the AL penalty. The reference lets rho grow unboundedly
    # (fine in f64); in f32 twenty AL rounds reach 1e20 and destroy the
    # AL cost, so f32 runs should cap around 1e5-1e6.
    rho_max: float = float("inf")
    armijo_c1: float = 1.0e-4
    reg_init: float = 1.0e-6
    reg_min: float = 1.0e-8
    reg_max: float = 1.0e8
    reg_up: float = 10.0
    reg_down: float = 0.5
    lambda_max: float = 1.0e8
    verbose: bool = False          # per-AL-iteration jax.debug.print logs
    # evaluate all Armijo step sizes as ONE batched rollout (vmap over the
    # alpha grid) instead of sequential trials — latency-optimal on TPU,
    # where a batched scan costs the same wall time as a single rollout
    parallel_linesearch: bool = False
    # parallel-in-time Riccati backward pass via associative scan
    # (log2(T) depth instead of T sequential steps; see PAPERS.md,
    # "The Parallelization of Riccati Recursion"). Mathematically
    # identical to the sequential pass (regularization folded into luu).
    parallel_riccati: bool = False
    # batched solvers only: run the Riccati backward pass as one fused
    # Pallas TPU kernel (ops/pallas/riccati.py) — batch across lanes,
    # whole recursion VMEM-resident. Same numerics as the XLA reverse
    # scan (tested); interpret-mode fallback on CPU.
    pallas_riccati: bool = False


class ILQRProblem(NamedTuple):
    """Problem definition. All callables are pure JAX.

    ``dynamics(t, x, u) -> y`` and ``dynamics_jac(t, x, u) -> (y, fx, fu)``
    (the latter lets implicit dynamics share one relaxed solve between fx
    and fu). ``stage_con`` returns a fixed-size ``(ncon,)`` vector for all
    stages (pad with zeros); ``terminal_con`` a ``(nconT,)`` vector.
    """

    T: int
    nx: int
    nu: int
    ncon: int
    nconT: int
    dynamics: Callable
    dynamics_jac: Callable
    stage_cost: Callable          # (t, x, u) -> scalar
    terminal_cost: Callable       # (x,) -> scalar
    stage_con: Optional[Callable] = None     # (t, x, u) -> (ncon,)
    terminal_con: Optional[Callable] = None  # (x,) -> (nconT,)
    ineq_mask: Optional[jnp.ndarray] = None      # (T-1, ncon) bool
    terminal_ineq_mask: Optional[jnp.ndarray] = None  # (nconT,) bool
    u_mask: Optional[jnp.ndarray] = None         # (T-1, nu) bool
    # optional per-timestep warm starts: implicit-dynamics steps warm-start
    # from the previous ACCEPTED trajectory's solver variables at the SAME
    # timestep (~2.4x fewer Newton iterations, and branch-consistent —
    # cross-time carry inside aggressive line-search rollouts can land on
    # different complementarity branches and derail the solve)
    dynamics_ws: Optional[Callable] = None   # (t, x, u, ws_t) -> (y, ws_t')
    ws_init: Optional[Callable] = None       # (t, x, u) -> ws_t
    # batched derivative sweep: (ts, xs, us) -> (ys, fxs, fus) in one call
    # (e.g. ImplicitDynamics.step_jac_batched — one masked while_loop over
    # the whole horizon instead of vmap-of-while)
    dynamics_jac_batched: Optional[Callable] = None
    # lane-batched forward dynamics (t, xs (B, nx), us (B, nu)) -> ys,
    # required by solver.ilqr_batched.solve_batched
    dynamics_batched: Optional[Callable] = None
    # open-loop rollout may thread cross-time carry (safe there: states
    # change slowly along a single rollout)
    dynamics_carry: Optional[Callable] = None    # (t, x, u, c) -> (y, c)
    carry_init: Optional[Callable] = None        # (x0,) -> carry pytree
    # warm-started lane-batched variants for the batched/segmented phases
    # (same-timestep warm starts, the batched analog of dynamics_ws):
    dynamics_batched_ws: Optional[Callable] = None
    # (t, xs, us, ws (B,nz)) -> (ys, ws')
    dynamics_jac_batched_ws: Optional[Callable] = None
    # (ts, xs, us, wss (N,nz)) -> (ys, fxs, fus, wss')
    ws_init_batched: Optional[Callable] = None   # (t, xs, us) -> ws (B,nz)
    # warm-start line-search rollouts from the previous accepted
    # trajectory's variables (default). False = line-search solves start
    # cold (ws_init_batched) but still return their variables, so the
    # derivative sweep re-solving the ACCEPTED trajectory warm-starts
    # from its own eval solution — benign by construction. Measured on
    # cartpole-friction (knife-edge, scripts/repro_f32.py): warm
    # line-search rollouts converge 6/16 lanes, cold 16/16.
    ws_linesearch: bool = True
    # thread each lane's PREVIOUS-timestep solver variables through the
    # batched open-loop and line-search rollouts (the batched analog of
    # ``dynamics_carry``: warm-start step t from the same rollout's step
    # t-1 solution). Unlike ``ws_linesearch`` — which warm-starts from a
    # DIFFERENT trajectory (the previous accepted one) and flips
    # complementarity branches on knife-edge problems — the carry stays
    # on the trajectory being rolled out; consecutive states change
    # slowly, and ``kappa_init_min`` restores a short central-path
    # continuation. Only read when ``ws_linesearch`` is False.
    ws_carry: bool = False
    # whole-rollout fused Pallas kernel (ops/pallas/fused_rollout.py):
    # ``(x0s, xss_ref, uss_ref, Kss, kss, alphas) -> (xss, uss, wss)``.
    # When set, make_phases' closed-loop and open-loop rollouts run as
    # ONE kernel launch instead of a scan of per-step launches + glue.
    # Requires the cold line-search policy (ws_linesearch=False, no
    # ws_carry) — the kernel re-inits each step from init_z(q1).
    rollout_fused: Optional[Callable] = None


class ILQRResult(NamedTuple):
    xs: jnp.ndarray
    us: jnp.ndarray
    objective: jnp.ndarray        # smooth objective of the solution
    al_objective: jnp.ndarray     # augmented-Lagrangian objective
    iterations: jnp.ndarray       # total inner iLQR iterations
    al_iterations: jnp.ndarray
    constraint_violation: jnp.ndarray
    gradient_norm: jnp.ndarray
    converged: jnp.ndarray
    # final AL state, for warm-starting a re-solve (``solve(...,
    # lam_init=res.lam, lamT_init=res.lamT, rho_init=res.rho)``) — e.g.
    # sweep retries on perturbed scenarios or receding-horizon re-solves
    lam: Optional[jnp.ndarray] = None      # (T-1, ncon)
    lamT: Optional[jnp.ndarray] = None     # (nconT,)
    rho: Optional[jnp.ndarray] = None      # scalar


# ---------------------------------------------------------------------------
# augmented Lagrangian pieces


def _al_penalty(c, lam, rho, ineq):
    """PHR augmented-Lagrangian penalty for mixed eq/ineq rows.

    eq rows:   lam*c + rho/2 c^2
    ineq rows (c <= 0): (max(0, lam + rho c)^2 - lam^2) / (2 rho)
    """
    eq_term = lam * c + 0.5 * rho * c * c
    lam_new = jnp.maximum(0.0, lam + rho * c)
    ineq_term = (lam_new * lam_new - lam * lam) / (2.0 * rho)
    return jnp.sum(jnp.where(ineq, ineq_term, eq_term))


def _al_multiplier(c, lam, rho, ineq):
    """Effective multiplier (gradient of the penalty wrt c)."""
    eq_mult = lam + rho * c
    ineq_mult = jnp.maximum(0.0, lam + rho * c)
    return jnp.where(ineq, ineq_mult, eq_mult)


def _violation(c, lam, ineq):
    """Per-row constraint violation: |c| for eq, max(c, 0) for ineq."""
    del lam
    return jnp.where(ineq, jnp.maximum(c, 0.0), jnp.abs(c))


# ---------------------------------------------------------------------------


def _make_al_costs(prob: ILQRProblem):
    """Stage/terminal AL objectives and their Gauss-Newton expansions."""
    has_con = prob.stage_con is not None
    has_conT = prob.terminal_con is not None

    def stage_al(t, x, u, lam, rho):
        J = prob.stage_cost(t, x, u)
        if has_con:
            c = prob.stage_con(t, x, u)
            J = J + _al_penalty(c, lam, rho, prob.ineq_mask[t])
        return J

    def terminal_al(x, lamT, rho):
        J = prob.terminal_cost(x)
        if has_conT:
            c = prob.terminal_con(x)
            J = J + _al_penalty(c, lamT, rho, prob.terminal_ineq_mask)
        return J

    def stage_expansion(t, x, u, lam, rho):
        """Gradient and Gauss-Newton Hessian of the stage AL objective."""
        nx, nu = prob.nx, prob.nu

        def smooth(xu):
            return prob.stage_cost(t, xu[:nx], xu[nx:])

        xu = jnp.concatenate([x, u])
        g = jax.grad(smooth)(xu)
        H = jax.hessian(smooth)(xu)

        if has_con:
            def confun(xu):
                return prob.stage_con(t, xu[:nx], xu[nx:])
            c = confun(xu)
            cJ = jax.jacfwd(confun)(xu)          # (ncon, nx+nu)
            ineq = prob.ineq_mask[t]
            mult = _al_multiplier(c, lam, rho, ineq)
            active = jnp.where(ineq, (lam + rho * c) > 0.0, True)
            g = g + cJ.T @ mult
            H = H + rho * (cJ.T * active) @ cJ
        return g[:nx], g[nx:], H[:nx, :nx], H[nx:, nx:], H[nx:, :nx]

    def terminal_expansion(x, lamT, rho):
        g = jax.grad(prob.terminal_cost)(x)
        H = jax.hessian(prob.terminal_cost)(x)
        if has_conT:
            c = prob.terminal_con(x)
            cJ = jax.jacfwd(prob.terminal_con)(x)
            ineq = prob.terminal_ineq_mask
            mult = _al_multiplier(c, lamT, rho, ineq)
            active = jnp.where(ineq, (lamT + rho * c) > 0.0, True)
            g = g + cJ.T @ mult
            H = H + rho * (cJ.T * active) @ cJ
        return g, H

    return stage_al, terminal_al, stage_expansion, terminal_expansion


def rollout(prob: ILQRProblem, x0: jnp.ndarray, us: jnp.ndarray):
    """Open-loop rollout (reference: ``iLQR.rollout``,
    /root/reference/examples/cartpole.jl:79)."""
    ts = jnp.arange(prob.T - 1)

    if prob.dynamics_carry is not None:
        def f(carry, tu):
            x, c = carry
            t, u = tu
            y, c = prob.dynamics_carry(t, x, u, c)
            return (y, c), y

        (_, _), ys = jax.lax.scan(f, (x0, prob.carry_init(x0)), (ts, us))
    else:
        def f(x, tu):
            t, u = tu
            y = prob.dynamics(t, x, u)
            return y, y

        _, ys = jax.lax.scan(f, x0, (ts, us))
    return jnp.concatenate([x0[None], ys], axis=0)


def solve(prob: ILQRProblem, x0: jnp.ndarray, us_init: jnp.ndarray,
          opts: ILQROptions = ILQROptions(),
          xs_init: jnp.ndarray | None = None,
          lam_init: jnp.ndarray | None = None,
          lamT_init: jnp.ndarray | None = None,
          rho_init: jnp.ndarray | None = None) -> ILQRResult:
    """Run the AL-iLQR solve. Jit/vmap-safe.

    ``lam_init``/``lamT_init``/``rho_init`` warm-start the augmented-
    Lagrangian state from a previous solve (``ILQRResult.lam/lamT/rho``):
    a re-solve on a nearby problem starts with converged duals and the
    final penalty instead of re-running the whole multiplier homotopy."""
    T, nx, nu = prob.T, prob.nx, prob.nu
    ncon, nconT = prob.ncon, prob.nconT
    dtype = x0.dtype
    ts = jnp.arange(T - 1)

    prob = prob._replace(
        ineq_mask=(jnp.zeros((T - 1, max(ncon, 1)), bool)
                   if prob.ineq_mask is None else prob.ineq_mask),
        terminal_ineq_mask=(jnp.zeros(max(nconT, 1), bool)
                            if prob.terminal_ineq_mask is None
                            else prob.terminal_ineq_mask),
        u_mask=(jnp.ones((T - 1, nu), bool)
                if prob.u_mask is None else prob.u_mask),
    )
    stage_al, terminal_al, stage_exp, terminal_exp = _make_al_costs(prob)

    def traj_cost(xs, us, lam, lamT, rho):
        Js = jax.vmap(stage_al, in_axes=(0, 0, 0, 0, None))(
            ts, xs[:-1], us, lam, rho)
        return jnp.sum(Js) + terminal_al(xs[-1], lamT, rho)

    def smooth_cost(xs, us):
        Js = jax.vmap(prob.stage_cost)(ts, xs[:-1], us)
        return jnp.sum(Js) + prob.terminal_cost(xs[-1])

    has_ws = prob.dynamics_ws is not None

    def closed_loop_rollout(xs_ref, us_ref, Ks, ks, alpha, lam, lamT, rho,
                            wss):
        def f(carry, inp):
            x, J = carry
            t, x_ref, u_ref, K, k, ws = inp
            u = u_ref + alpha * k + K @ (x - x_ref)
            u = jnp.where(prob.u_mask[t], u, u_ref)
            J = J + stage_al(t, x, u, lam[t], rho)
            if has_ws:
                y, ws = prob.dynamics_ws(t, x, u, ws)
            else:
                y = prob.dynamics(t, x, u)
            return (y, J), (x, u, ws)

        (xT, J), (xs, us, wss_new) = jax.lax.scan(
            f, (xs_ref[0], jnp.asarray(0.0, dtype)),
            (ts, xs_ref[:-1], us_ref, Ks, ks, wss))
        J = J + terminal_al(xT, lamT, rho)
        xs = jnp.concatenate([xs, xT[None]], axis=0)
        return xs, us, J, wss_new

    def backward(fxs, fus, lxs, lus, lxxs, luus, luxs, gT, HT, reg):
        """Reverse Riccati scan; returns gains + expected decrease."""
        def step(carry, inp):
            Vx, Vxx = carry
            t, fx, fu, lx, lu, lxx, luu, lux = inp
            Qx = lx + fx.T @ Vx
            Qu = lu + fu.T @ Vx
            Qxx = lxx + fx.T @ Vxx @ fx
            Quu = luu + fu.T @ Vxx @ fu
            Qux = lux + fu.T @ Vxx @ fx

            m = prob.u_mask[t]
            Qu = jnp.where(m, Qu, 0.0)
            Qux = jnp.where(m[:, None], Qux, 0.0)
            mm = jnp.outer(m, m)
            Quu = jnp.where(mm, Quu, 0.0) + jnp.diag(
                jnp.where(m, reg, 1.0))

            chol = jnp.linalg.cholesky(Quu)
            ok = jnp.all(jnp.isfinite(chol))
            rhs = jnp.concatenate([Qu[:, None], Qux], axis=1)
            sol = jax.scipy.linalg.cho_solve((chol, True), rhs)
            k = -sol[:, 0]
            K = -sol[:, 1:]

            Vx_new = Qx + K.T @ Qu + Qux.T @ k + K.T @ Quu @ k
            Vxx_new = Qxx + K.T @ Qux + Qux.T @ K + K.T @ Quu @ K
            Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
            dV1 = jnp.dot(k, Qu)
            dV2 = 0.5 * jnp.dot(k, Quu @ k)
            qu_inf = jnp.max(jnp.abs(Qu))
            return (Vx_new, Vxx_new), (K, k, dV1, dV2, qu_inf, ok)

        (_, _), (Ks, ks, dV1s, dV2s, qu_infs, oks) = jax.lax.scan(
            step, (gT, HT),
            (ts, fxs, fus, lxs, lus, lxxs, luus, luxs),
            reverse=True)
        return (Ks, ks, jnp.sum(dV1s), jnp.sum(dV2s),
                jnp.max(qu_infs), jnp.all(oks))

    def backward_parallel(fxs, fus, lxs, lus, lxxs, luus, luxs, gT, HT,
                          reg):
        """Associative-scan Riccati: identical math to ``backward`` with
        the regularizer folded into luu, but log2(T) sequential depth.

        Conditional-value-function elements (A, b, C, eta, J) composed by
        W(x,z) = max_l [l^T(z - A x - b) - l^T C l / 2] + x^T J x / 2
                 - eta^T x.
        """
        nxl = prob.nx
        m = prob.u_mask                                  # (T-1, nu)
        mm = m[:, :, None] * m[:, None, :]
        luu_m = (jnp.where(mm, luus, 0.0)
                 + jax.vmap(jnp.diag)(jnp.where(m, reg, 1.0)))
        lu_m = jnp.where(m, lus, 0.0)
        lux_m = jnp.where(m[:, :, None], luxs, 0.0)
        fus_m = jnp.where(m[:, None, :], fus, 0.0)

        uinv_lux = jax.vmap(jnp.linalg.solve)(luu_m, lux_m)
        uinv_lu = jax.vmap(jnp.linalg.solve)(luu_m, lu_m[..., None])[..., 0]
        uinv_gt = jax.vmap(jnp.linalg.solve)(
            luu_m, jnp.swapaxes(fus_m, 1, 2))

        A_el = fxs - jnp.einsum("tij,tjk->tik", fus_m, uinv_lux)
        b_el = -jnp.einsum("tij,tj->ti", fus_m, uinv_lu)
        C_el = jnp.einsum("tij,tjk->tik", fus_m, uinv_gt)
        J_el = lxxs - jnp.einsum("tji,tjk->tik", lux_m, uinv_lux)
        eta_el = -(lxs - jnp.einsum("tji,tj->ti", lux_m, uinv_lu))

        # append the terminal element (A=0, b=0, C=0, J=HT, eta=-gT)
        zero_m = jnp.zeros((1, nxl, nxl), dtype)
        A_all = jnp.concatenate([A_el, zero_m], axis=0)
        b_all = jnp.concatenate([b_el, jnp.zeros((1, nxl), dtype)], axis=0)
        C_all = jnp.concatenate([C_el, zero_m], axis=0)
        J_all = jnp.concatenate([J_el, HT[None]], axis=0)
        eta_all = jnp.concatenate([eta_el, -gT[None]], axis=0)

        eye = jnp.eye(nxl, dtype=dtype)

        def combine(early, late):
            A1, b1, C1, e1, J1 = early
            A2, b2, C2, e2, J2 = late
            M = eye + C1 @ J2
            Minv_A1 = jnp.linalg.solve(M, A1)
            Minv_rhs = jnp.linalg.solve(M, (b1 + C1 @ e2)[:, None])[:, 0]
            Nt = eye + J2 @ C1
            Ninv_J2A1 = jnp.linalg.solve(Nt, J2 @ A1)
            Ninv_vec = jnp.linalg.solve(Nt, (e2 - J2 @ b1)[:, None])[:, 0]
            A = A2 @ Minv_A1
            b = A2 @ Minv_rhs + b2
            C = A2 @ jnp.linalg.solve(M, C1) @ A2.T + C2
            C = 0.5 * (C + C.T)
            eta = A1.T @ Ninv_vec + e1
            J = A1.T @ Ninv_J2A1 + J1
            J = 0.5 * (J + J.T)
            return (A, b, C, eta, J)

        suffix = jax.lax.associative_scan(
            lambda a, b: jax.vmap(combine)(b, a),
            (A_all, b_all, C_all, eta_all, J_all), reverse=True)
        # V_t(x) = x^T J x / 2 - eta^T x  ->  Vxx = J, Vx = -eta
        Vxx = suffix[4]
        Vx = -suffix[3]

        def gains(t, fx, fu, lx, lu, lxx, luu, lux):
            Vx1 = Vx[t + 1]
            Vxx1 = Vxx[t + 1]
            mt = prob.u_mask[t]
            Qu = jnp.where(mt, lu + fu.T @ Vx1, 0.0)
            Qux = jnp.where(mt[:, None], lux + fu.T @ Vxx1 @ fx, 0.0)
            Quu = (jnp.where(jnp.outer(mt, mt), luu + fu.T @ Vxx1 @ fu,
                             0.0)
                   + jnp.diag(jnp.where(mt, reg, 1.0)))
            chol = jnp.linalg.cholesky(Quu)
            ok = jnp.all(jnp.isfinite(chol))
            rhs = jnp.concatenate([Qu[:, None], Qux], axis=1)
            sol = jax.scipy.linalg.cho_solve((chol, True), rhs)
            k = -sol[:, 0]
            K = -sol[:, 1:]
            dV1 = jnp.dot(k, Qu)
            dV2 = 0.5 * jnp.dot(k, Quu @ k)
            return K, k, dV1, dV2, jnp.max(jnp.abs(Qu)), ok

        Ks, ks, dV1s, dV2s, qu_infs, oks = jax.vmap(gains)(
            ts, fxs, fus, lxs, lus, lxxs, luus, luxs)
        return (Ks, ks, jnp.sum(dV1s), jnp.sum(dV2s),
                jnp.max(qu_infs), jnp.all(oks))

    backward_fn = backward_parallel if opts.parallel_riccati else backward

    def ilqr_inner(xs, us, wss, lam, lamT, rho):
        """Run the unconstrained (AL-objective) iLQR to tolerance.
        ``max_iter`` bounds the iterations of *this* inner solve (one AL
        round), matching the reference's per-round ``max_iter``."""

        def derivatives(xs, us):
            if prob.dynamics_jac_batched is not None:
                ys, fxs, fus = prob.dynamics_jac_batched(ts, xs[:-1], us)
            else:
                ys, fxs, fus = jax.vmap(prob.dynamics_jac)(ts, xs[:-1], us)
            del ys
            lxs, lus, lxxs, luus, luxs = jax.vmap(
                stage_exp, in_axes=(0, 0, 0, 0, None))(
                    ts, xs[:-1], us, lam, rho)
            gT, HT = terminal_exp(xs[-1], lamT, rho)
            return fxs, fus, lxs, lus, lxxs, luus, luxs, gT, HT

        def cond(state):
            xs, us, wss, J, reg, it, done, gnorm = state
            return jnp.logical_and(it < opts.max_iter,
                                   jnp.logical_not(done))

        def body(state):
            xs, us, wss, J, reg, it, done, gnorm = state
            d = derivatives(xs, us)
            Ks, ks, dV1, dV2, qu_inf, bp_ok = backward_fn(*d, reg)

            if opts.parallel_linesearch:
                import math
                n_alpha = int(math.ceil(
                    math.log2(1.0 / opts.alpha_min))) + 1
                alphas = (0.5 ** jnp.arange(n_alpha)).astype(dtype)
                xs_c, us_c, J_c, wss_c = jax.vmap(
                    lambda a: closed_loop_rollout(
                        xs, us, Ks, ks, a, lam, lamT, rho, wss))(alphas)
                expected = alphas * dV1 + alphas * alphas * dV2
                ok = jnp.logical_and(
                    jnp.isfinite(J_c),
                    J_c <= J + opts.armijo_c1 * jnp.minimum(expected, 0.0))
                accepted = jnp.any(ok)
                pick = jnp.argmax(ok)       # largest alpha that passes
                xs_n = jnp.where(accepted, xs_c[pick], xs)
                us_n = jnp.where(accepted, us_c[pick], us)
                J_n = jnp.where(accepted, J_c[pick], J)
                wss_n = jax.tree_util.tree_map(
                    lambda c, old: jnp.where(accepted, c[pick], old),
                    wss_c, wss)
            else:
                def ls_cond(ls):
                    alpha, accepted, best = ls
                    return jnp.logical_and(alpha >= opts.alpha_min,
                                           jnp.logical_not(accepted))

                def ls_body(ls):
                    alpha, accepted, best = ls
                    xs_c, us_c, J_c, wss_c = closed_loop_rollout(
                        xs, us, Ks, ks, alpha, lam, lamT, rho, wss)
                    expected = alpha * dV1 + alpha * alpha * dV2
                    ok = jnp.logical_and(
                        jnp.isfinite(J_c),
                        J_c <= J + opts.armijo_c1
                        * jnp.minimum(expected, 0.0))
                    best = jax.tree_util.tree_map(
                        lambda new, old: jnp.where(ok, new, old),
                        (xs_c, us_c, J_c, wss_c), best)
                    return (alpha * 0.5, jnp.logical_or(accepted, ok), best)

                init_best = (xs, us, J, wss)
                alpha0 = jnp.asarray(1.0, dtype)
                _, accepted, (xs_n, us_n, J_n, wss_n) = jax.lax.while_loop(
                    ls_cond, ls_body,
                    (alpha0, jnp.asarray(False), init_best))

            ls_failed = jnp.logical_not(jnp.logical_and(accepted, bp_ok))
            reg_n = jnp.where(
                ls_failed,
                jnp.minimum(jnp.maximum(reg * opts.reg_up, opts.reg_min * opts.reg_up), opts.reg_max),
                jnp.maximum(reg * opts.reg_down, opts.reg_min))
            # failed step: keep current trajectory
            xs_n = jnp.where(ls_failed, xs, xs_n)
            us_n = jnp.where(ls_failed, us, us_n)
            J_n = jnp.where(ls_failed, J, J_n)
            wss_n = jax.tree_util.tree_map(
                lambda c, old: jnp.where(ls_failed, old, c), wss_n, wss)

            grad_small = qu_inf < opts.grad_tol
            obj_small = jnp.abs(J - J_n) < opts.obj_tol
            reg_capped = reg_n >= opts.reg_max
            done_n = jnp.logical_or(
                grad_small,
                jnp.logical_or(jnp.logical_and(accepted, obj_small),
                               jnp.logical_and(ls_failed, reg_capped)))
            return (xs_n, us_n, wss_n, J_n, reg_n, it + 1, done_n, qu_inf)

        J0 = traj_cost(xs, us, lam, lamT, rho)
        state = (xs, us, wss, J0, jnp.asarray(opts.reg_init, dtype),
                 jnp.asarray(0, jnp.int32), jnp.asarray(False),
                 jnp.asarray(jnp.inf, dtype))
        xs, us, wss, J, reg, it, _, gnorm = jax.lax.while_loop(
            cond, body, state)
        return xs, us, wss, J, it, gnorm

    # ----- augmented Lagrangian outer loop -----
    has_con = prob.stage_con is not None
    has_conT = prob.terminal_con is not None

    def con_violation(xs, us, lam, lamT):
        v = jnp.asarray(0.0, dtype)
        if has_con:
            cs = jax.vmap(prob.stage_con)(ts, xs[:-1], us)
            v = jnp.maximum(v, jnp.max(_violation(cs, lam, prob.ineq_mask)))
        if has_conT:
            cT = prob.terminal_con(xs[-1])
            v = jnp.maximum(
                v, jnp.max(_violation(cT, lamT, prob.terminal_ineq_mask)))
        return v

    def dual_update(xs, us, lam, lamT, rho):
        if has_con:
            cs = jax.vmap(prob.stage_con)(ts, xs[:-1], us)
            lam = jnp.clip(_al_multiplier(cs, lam, rho, prob.ineq_mask),
                           -opts.lambda_max, opts.lambda_max)
        if has_conT:
            cT = prob.terminal_con(xs[-1])
            lamT = jnp.clip(
                _al_multiplier(cT, lamT, rho, prob.terminal_ineq_mask),
                -opts.lambda_max, opts.lambda_max)
        return lam, lamT

    xs0 = rollout(prob, x0, us_init) if xs_init is None else xs_init
    if has_ws:
        wss0 = jax.vmap(prob.ws_init)(ts, xs0[:-1], us_init)
    else:
        wss0 = jnp.zeros(T - 1, dtype)
    lam0 = (jnp.zeros((T - 1, max(ncon, 1)), dtype)
            if lam_init is None else jnp.asarray(lam_init, dtype))
    lamT0 = (jnp.zeros(max(nconT, 1), dtype)
             if lamT_init is None else jnp.asarray(lamT_init, dtype))
    rho0 = (jnp.asarray(opts.rho_init, dtype)
            if rho_init is None else jnp.asarray(rho_init, dtype))

    def al_cond(state):
        xs, us, wss, lam, lamT, rho, it, al_it, vio, gnorm = state
        converged = vio < opts.con_tol
        return jnp.logical_and(al_it < opts.max_al_iter,
                               jnp.logical_not(converged))

    def al_body(state):
        xs, us, wss, lam, lamT, rho, it, al_it, vio, _ = state
        xs, us, wss, J, inner_it, gnorm = ilqr_inner(xs, us, wss, lam,
                                                     lamT, rho)
        it = it + inner_it
        vio = con_violation(xs, us, lam, lamT)
        if opts.verbose:
            jax.debug.print(
                "al it={al} inner={inner} J={J:.6e} vio={vio:.3e} rho={rho:.1e}",
                al=al_it, inner=inner_it, J=J, vio=vio, rho=rho)
        lam, lamT = dual_update(xs, us, lam, lamT, rho)
        rho = jnp.minimum(rho * opts.rho_scale, opts.rho_max)
        return (xs, us, wss, lam, lamT, rho, it, al_it + 1, vio, gnorm)

    vio_init = jnp.asarray(jnp.inf, dtype)
    state = (xs0, us_init, wss0, lam0, lamT0, rho0,
             jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32), vio_init,
             jnp.asarray(jnp.inf, dtype))
    if has_con or has_conT:
        (xs, us, wss, lam, lamT, rho, it, al_it, vio,
         gnorm) = jax.lax.while_loop(al_cond, al_body, state)
    else:
        xs, us, wss, J, it, gnorm = ilqr_inner(xs0, us_init, wss0, lam0,
                                               lamT0, rho0)
        lam, lamT, rho = lam0, lamT0, rho0
        al_it = jnp.asarray(1, jnp.int32)
        vio = jnp.asarray(0.0, dtype)

    al_obj = traj_cost(xs, us, lam, lamT, rho)
    obj = smooth_cost(xs, us)
    return ILQRResult(
        xs=xs, us=us,
        objective=obj,
        al_objective=al_obj,
        iterations=it,
        al_iterations=al_it,
        constraint_violation=vio,
        gradient_norm=gnorm,
        converged=vio < opts.con_tol,
        lam=lam, lamT=lamT, rho=rho,
    )
