"""Planar pushing: translate or rotate a box with a point pusher.

Parity with /root/reference/examples/planar_push.jl: h=0.1, T=26,
kappa_eval=1e-4, kappa_grad=1e-2, control box |u| <= 5, terminal equality
on block pose (both configurations), max_iter=10 / max_al_iter=10.
Optionally uses the stochastic gradient bundle instead of IFT gradients
(GB flag, planar_push.jl:14-30).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from optimization_dynamics_tpu.dynamics import make_implicit_dynamics
from optimization_dynamics_tpu.models import planar_push as pp
from optimization_dynamics_tpu.solver.ilqr import (
    ILQROptions,
    ILQRProblem,
    solve,
)

H = 0.1
T = 26
NX = 2 * pp.NQ
NU = pp.NU
R = pp.R_DIM


def build_problem(mode: str = "rotate", gradient_bundle: bool = False,
                  dtype=jnp.float64):
    aux = pp.PlanarPushAux(h=H)
    dyn = make_implicit_dynamics(
        pp.model(), r_tol=1.0e-8, kappa_eval_tol=1.0e-4,
        kappa_grad_tol=1.0e-2)

    if mode == "translate":
        q0 = jnp.array([0.0, 0.0, 0.0, -R - 1.0e-8, 0.0], dtype)
        q1 = q0
        goal = (1.0, 0.0, 0.0)
    else:
        q0 = jnp.array([0.0, 0.0, 0.0, -R - 1.0e-8, -0.01], dtype)
        q1 = q0
        goal = (0.5, 0.5, 0.5 * jnp.pi)
    xg, yg, tg = goal
    qT = jnp.array([xg, yg, tg, xg - R, yg - R], dtype)
    xT = jnp.concatenate([qT, qT])
    x0 = jnp.concatenate([q0, q1])

    vw = jnp.array([1.0, 1.0, 1.0, 0.1, 0.1], dtype)
    xw = jnp.array([1.0, 1.0, 1.0, 0.1, 0.1] * 2, dtype)
    uw = 1.0e-1 if mode == "translate" else 1.0e-2

    def stage_cost(t, x, u):
        v1 = (x[5:] - x[:5]) / H
        dx = x - xT
        return (0.5 * v1 @ (vw * v1) + 0.5 * dx @ (xw * dx)
                + 0.5 * uw * u @ u)

    def terminal_cost(x):
        v1 = (x[5:] - x[:5]) / H
        dx = x - xT
        return 0.5 * v1 @ (vw * v1) + 0.5 * dx @ (xw * dx)

    u_lim = 5.0

    def stage_con(t, x, u):
        return jnp.concatenate([-u_lim - u, u - u_lim])

    sel = jnp.array([0, 1, 2, 5, 6, 7])

    def terminal_con(x):
        return (x - xT)[sel]

    if gradient_bundle:
        from optimization_dynamics_tpu.solver.gradient_bundle import (
            make_gradient_bundle,
        )
        gb_jac = make_gradient_bundle(dyn, n_samples=50, eps=1.0e-4)

        def dynamics_jac(t, x, u):
            return gb_jac(x, u, aux, jax.random.fold_in(
                jax.random.PRNGKey(0), t))
    else:
        def dynamics_jac(t, x, u):
            return dyn.step_jac(x, u, aux)

    prob = ILQRProblem(
        T=T, nx=NX, nu=NU, ncon=2 * NU, nconT=6,
        dynamics=lambda t, x, u: dyn.step(x, u, aux),
        dynamics_jac=dynamics_jac,
        dynamics_jac_batched=(
            None if gradient_bundle
            else lambda ts, xs, us: dyn.step_jac_batched(xs, us, aux)),
        stage_cost=stage_cost,
        terminal_cost=terminal_cost,
        stage_con=stage_con,
        terminal_con=terminal_con,
        ineq_mask=jnp.ones((T - 1, 2 * NU), bool),
        dynamics_ws=lambda t, x, u, z: dyn.step_carry(z, x, u, aux),
        ws_init=lambda t, x, u: dyn.carry_init(x),
    )

    opts = ILQROptions(
        alpha_min=1.0e-5,
        obj_tol=1.0e-3,
        grad_tol=1.0e-3,
        max_iter=10,
        max_al_iter=10,
        con_tol=0.005,
        rho_init=1.0,
        rho_scale=10.0,
    )

    # reference warm start (planar_push.jl:111)
    ts = jnp.arange(T - 1)
    if mode == "translate":
        u0 = jnp.where(ts[:, None] < 4,
                       jnp.array([[1.0, 0.0]], dtype),
                       jnp.zeros((1, 2), dtype))
    else:
        u0 = jnp.where(
            ts[:, None] < 4, jnp.array([[1.0, 0.0]], dtype),
            jnp.where(ts[:, None] < 9, jnp.array([[0.5, 0.0]], dtype),
                      jnp.zeros((1, 2), dtype)))
    return prob, x0, u0, opts


def build_deploy_problem(on_tpu: bool, mode: str = "translate",
                         dtype=None, fused: bool = True):
    """Deploy-tier planar push (VERDICT r3 #4: put a second contact
    system on the chip): the reference configuration
    (/root/reference/examples/planar_push.jl:18-19, h=0.1, T=26) with
    the hardest cone geometry in the suite — nz=35, orthant + 4x
    SOC(3) + SOC(2) (src/models/planar_push/simulator.jl:16-50) —
    wired for the segmented executor: f32 IP tolerances at the chip
    floor, fused Pallas lane-batched solves, warm derivative sweeps +
    cold line-search rollouts (the cartpole deploy policy,
    BASELINE.md). Returns ``(prob, x0, us_init, opts)``."""
    import dataclasses

    from optimization_dynamics_tpu.solver.interior_point import IPOptions

    if dtype is None:
        dtype = jnp.float32 if on_tpu else jnp.float64
    prob, x0, us0, opts = build_problem(mode, dtype=dtype)
    aux = pp.PlanarPushAux(h=H)
    if on_tpu:
        ip = dict(r_tol=3.0e-5, kappa_tol=1.0e-3, max_iter=40, max_ls=8)
    else:
        ip = dict(r_tol=1.0e-8, kappa_tol=1.0e-3, max_iter=40, max_ls=8)
        fused = False
    dyn = make_implicit_dynamics(
        pp.model(),
        eval_opts=IPOptions(**ip),
        grad_opts=IPOptions(**ip),
        fused=fused)
    prob = prob._replace(
        dynamics=lambda t, x, u: dyn.step(x, u, aux),
        dynamics_jac=lambda t, x, u: dyn.step_jac(x, u, aux),
        dynamics_jac_batched=lambda ts, xs, us: dyn.step_jac_batched(
            xs, us, aux),
        dynamics_batched=lambda t, xs, us: dyn.step_batched(xs, us, aux),
        dynamics_carry=lambda t, x, u, z: dyn.step_carry(z, x, u, aux),
        carry_init=dyn.carry_init,
        dynamics_batched_ws=lambda t, xs, us, ws: dyn.step_batched_ws(
            xs, us, aux, ws),
        dynamics_jac_batched_ws=lambda ts, xs, us, wss:
            dyn.step_jac_batched_ws(xs, us, aux, wss),
        ws_init_batched=lambda t, xs, us: jax.vmap(dyn.carry_init)(xs),
        ws_linesearch=False)
    opts = dataclasses.replace(opts, con_tol=0.01, rho_max=1.0e6,
                               alpha_min=1.0e-2)
    return prob, x0, us0, opts


def run(mode: str = "rotate", gradient_bundle: bool = False):
    prob, x0, us_init, opts = build_problem(mode, gradient_bundle)
    res = jax.jit(lambda x, u: solve(prob, x, u, opts))(x0, us_init)
    return prob, res


def main():
    import numpy as np
    for mode in ("translate", "rotate"):
        prob, res = run(mode)
        print(f"[{mode}] converged: {bool(res.converged)}"
              f" obj: {float(res.objective):.4f}"
              f" iters: {int(res.iterations)}"
              f" al: {int(res.al_iterations)}"
              f" vio: {float(res.constraint_violation):.2e}")
        print("  final block pose:",
              np.round(np.asarray(res.xs[-1][5:8]), 4))


if __name__ == "__main__":
    main()
