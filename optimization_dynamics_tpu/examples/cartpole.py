"""Cartpole swing-up with joint friction.

Parity with /root/reference/examples/cartpole.jl: h=0.05, T=51,
friction = [0.35, 0.35] (the paper's hard case), kappa_eval=1e-4,
kappa_grad=1e-3, effort stage cost, terminal goal cost + equality
constraint, con_tol=0.005.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from optimization_dynamics_tpu.dynamics import make_implicit_dynamics
from optimization_dynamics_tpu.models import cartpole
from optimization_dynamics_tpu.solver.ilqr import (
    ILQROptions,
    ILQRProblem,
    solve,
)

H = 0.05
T = 51
NX = 2 * cartpole.NQ
NU = cartpole.NU


def build_problem(mode: str = "friction", friction=(0.35, 0.35),
                  dtype=jnp.float64):
    """Returns (prob, x0, us_init, opts). ``mode``: "friction" |
    "frictionless"."""
    if mode == "friction":
        model = cartpole.friction_model()
        aux = cartpole.CartpoleAux(
            h=H, friction=jnp.asarray(friction, dtype))
        kappa_eval, kappa_grad = 1.0e-4, 1.0e-3
    else:
        model = cartpole.frictionless_model()
        aux = cartpole.CartpoleAux(h=H, friction=None)
        kappa_eval = kappa_grad = 1.0
    dyn = make_implicit_dynamics(
        model, r_tol=1.0e-8, kappa_eval_tol=kappa_eval,
        kappa_grad_tol=kappa_grad)

    xT = jnp.array([0.0, jnp.pi, 0.0, jnp.pi], dtype)

    def stage_cost(t, x, u):
        return u @ u

    def terminal_cost(x):
        return (x - xT) @ (x - xT)

    prob = ILQRProblem(
        T=T, nx=NX, nu=NU, ncon=0, nconT=NX,
        dynamics=lambda t, x, u: dyn.step(x, u, aux),
        dynamics_jac=lambda t, x, u: dyn.step_jac(x, u, aux),
        dynamics_jac_batched=lambda ts, xs, us: dyn.step_jac_batched(
            xs, us, aux),
        stage_cost=stage_cost,
        terminal_cost=terminal_cost,
        terminal_con=lambda x: x - xT,
        # open-loop carry only: the friction-0.35 swing-up is knife-edge
        # sensitive and line-search warm starts (dynamics_ws) push it off
        # its convergence path — see docs/DESIGN.md
        dynamics_carry=lambda t, x, u, z: dyn.step_carry(z, x, u, aux),
        carry_init=dyn.carry_init,
    )

    opts = ILQROptions(
        alpha_min=1.0e-5,
        obj_tol=1.0e-5,
        grad_tol=1.0e-3,
        max_iter=100,
        max_al_iter=20,
        con_tol=0.005,
        rho_init=1.0,
        rho_scale=10.0,
    )

    x0 = jnp.zeros(NX, dtype)
    us_init = jnp.zeros((T - 1, NU), dtype).at[0, 0].set(-1.5)
    return prob, x0, us_init, opts


def build_deploy_problem(on_tpu: bool, dtype=None, fused: bool = True,
                         friction=(0.35, 0.35),
                         fused_rollout: bool = False,
                         ip_overrides: dict | None = None):
    """The DEPLOY-tier problem: the configuration bench.py measures,
    reachable from the user-facing API (VERDICT r3 #7).

    Policy (bisected in rounds 1-3, BASELINE.md / docs/DESIGN.md):
    line-search rollouts run COLD (warm-starting them flips
    complementarity branches on the knife-edge friction-0.35 swing-up),
    the derivative sweep warm-starts from the accepted trajectory's own
    eval solution (~1 Newton iteration, branch-safe); on TPU the IP
    tolerances sit at the f32 floor (r_tol 3e-5), the fused Pallas
    whole-solve kernel runs the lane-batched IP solves, the AL penalty
    is capped at 1e6 (f32 AL-cost headroom) and con_tol relaxes to
    0.01. Returns ``(prob, x0, us_init, opts)``; solve with
    ``solver.ilqr_segmented.make_segmented_solver`` (the deploy
    executor) or ``solver.ilqr_batched.solve_batched``."""
    import dataclasses

    from optimization_dynamics_tpu.solver.interior_point import IPOptions

    if dtype is None:
        dtype = jnp.float32 if on_tpu else jnp.float64
    prob, x0, us0, opts = build_problem("friction", dtype=dtype)
    model = cartpole.friction_model()
    aux = cartpole.CartpoleAux(h=H, friction=jnp.asarray(friction, dtype))
    if on_tpu:
        # kappa-continuation schedule (round-5 on-chip A/B,
        # logs/bench_r5_kscale*.log): every rollout step cold-walks the
        # central path, so its stage count sets the per-step Newton
        # budget. kappa_scale 0.01 (one stage to the 1e-3 park),
        # init cap 0.3, center_frac 0.2: 1.103 -> 1.507 converged
        # solves/s AND 120 -> 123/128 converged; the harsher
        # init_max=0.1/center=0.3 arm regressed to 1.113 at 121/128.
        ip = dict(r_tol=3.0e-5, kappa_tol=1.0e-3, max_iter=40, max_ls=8,
                  kappa_scale=0.01, kappa_init_max=0.3, center_frac=0.2)
    else:
        ip = dict(r_tol=1.0e-8, kappa_tol=1.0e-3, max_iter=40, max_ls=8)
        fused = False
    if ip_overrides:
        # central-path schedule knobs (kappa_scale / kappa_init_max /
        # center_frac ...): rollout IP solves re-walk the kappa
        # continuation from scratch each step, so the schedule sets the
        # per-step Newton-iteration count — A/B-gated in bench.py
        ip.update(ip_overrides)
    dyn = make_implicit_dynamics(
        model,
        eval_opts=IPOptions(**ip),
        grad_opts=IPOptions(**ip),
        fused=fused)  # lane-batched solves via the fused Pallas kernel
    prob = prob._replace(
        dynamics=lambda t, x, u: dyn.step(x, u, aux),
        dynamics_jac=lambda t, x, u: dyn.step_jac(x, u, aux),
        dynamics_jac_batched=lambda ts, xs, us: dyn.step_jac_batched(
            xs, us, aux),
        dynamics_batched=lambda t, xs, us: dyn.step_batched(xs, us, aux),
        dynamics_carry=lambda t, x, u, z: dyn.step_carry(z, x, u, aux),
        carry_init=dyn.carry_init,
        # thread solver variables through the phases, but keep
        # line-search rollouts COLD (ws_linesearch=False): only the
        # derivative sweep re-solving the accepted trajectory
        # warm-starts (~1 Newton iteration; branch-safe)
        dynamics_batched_ws=lambda t, xs, us, ws: dyn.step_batched_ws(
            xs, us, aux, ws),
        dynamics_jac_batched_ws=lambda ts, xs, us, wss:
            dyn.step_jac_batched_ws(xs, us, aux, wss),
        ws_init_batched=lambda t, xs, us: jax.vmap(dyn.carry_init)(xs),
        ws_linesearch=False)
    # f32: cap the AL penalty (rho past ~1e6 destroys f32 AL costs);
    # 8-candidate Armijo grid (alpha_min 1e-2) — plenty at con_tol 0.01
    opts = dataclasses.replace(opts, con_tol=0.01, rho_max=1.0e6,
                               alpha_min=1.0e-2)
    if fused_rollout and fused and on_tpu:
        # whole-rollout fused kernel: T-1 feedback+IP steps per Pallas
        # launch instead of a scan of per-step launches + glue
        # (ops/pallas/fused_rollout.py; A/B-gated in bench.py)
        from optimization_dynamics_tpu.ops.pallas.fused_rollout import (
            make_fused_rollout)
        prob = prob._replace(rollout_fused=make_fused_rollout(
            model, IPOptions(**ip), aux, T))
    return prob, x0, us0, opts


def run(mode: str = "friction", friction=(0.35, 0.35)):
    prob, x0, us_init, opts = build_problem(mode, friction)
    res = jax.jit(lambda x, u: solve(prob, x, u, opts))(x0, us_init)
    return prob, res


def main():
    import numpy as np
    for mode in ("frictionless", "friction"):
        prob, res = run(mode)
        xT = np.array([0.0, np.pi, 0.0, np.pi])
        print(f"[{mode}] converged: {bool(res.converged)}"
              f" obj: {float(res.objective):.4f}"
              f" iters: {int(res.iterations)}"
              f" al: {int(res.al_iterations)}"
              f" |xT - goal|inf: "
              f"{float(np.max(np.abs(np.asarray(res.xs[-1]) - xT))):.2e}")


def visualize_solution(res):
    from optimization_dynamics_tpu.dynamics import state_to_configuration
    from optimization_dynamics_tpu.utils.viz import maybe_visualize
    return maybe_visualize("cartpole", state_to_configuration(res.xs), dt=H)


if __name__ == "__main__":
    main()
