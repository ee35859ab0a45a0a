"""Acrobot swing-up with hard elbow joint limits.

Parity with /root/reference/examples/acrobot.jl: h=0.05, T=101,
kappa_eval=1e-4, kappa_grad=1e-3, velocity+effort costs, terminal equality
constraint x = [pi,0,pi,0], AL options con_tol=0.001.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from optimization_dynamics_tpu.dynamics import make_implicit_dynamics
from optimization_dynamics_tpu.models import acrobot
from optimization_dynamics_tpu.solver.ilqr import (
    ILQROptions,
    ILQRProblem,
    rollout,
    solve,
)

H = 0.05
T = 101
NX = 2 * acrobot.NQ
NU = acrobot.NU


def build_problem(mode: str = "impact", kappa_grad: float = 1.0e-3,
                  dtype=jnp.float64):
    """Returns (prob, x0, us_init, opts). ``mode``: "impact" | "nominal"."""
    aux = acrobot.AcrobotAux(h=H)
    if mode == "impact":
        model = acrobot.impact_model()
        kappa_eval = 1.0e-4
    else:
        model = acrobot.nominal_model()
        kappa_eval = 1.0
        kappa_grad = 1.0
    dyn = make_implicit_dynamics(
        model, r_tol=1.0e-8, kappa_eval_tol=kappa_eval,
        kappa_grad_tol=kappa_grad)

    xT = jnp.array([jnp.pi, 0.0, jnp.pi, 0.0], dtype)

    def stage_cost(t, x, u):
        q1 = x[:2]
        q2 = x[2:]
        v1 = (q2 - q1) / H
        return 0.5 * 0.1 * v1 @ v1 + 0.5 * u @ u

    def terminal_cost(x):
        q1 = x[:2]
        q2 = x[2:]
        v1 = (q2 - q1) / H
        return 0.5 * 0.1 * v1 @ v1

    prob = ILQRProblem(
        T=T, nx=NX, nu=NU, ncon=0, nconT=NX,
        dynamics=lambda t, x, u: dyn.step(x, u, aux),
        dynamics_jac=lambda t, x, u: dyn.step_jac(x, u, aux),
        dynamics_jac_batched=lambda ts, xs, us: dyn.step_jac_batched(
            xs, us, aux),
        stage_cost=stage_cost,
        terminal_cost=terminal_cost,
        terminal_con=lambda x: x - xT,
        dynamics_ws=lambda t, x, u, z: dyn.step_carry(z, x, u, aux),
        ws_init=lambda t, x, u: dyn.carry_init(x),
    )

    opts = ILQROptions(
        alpha_min=1.0e-5,
        obj_tol=1.0e-5,
        grad_tol=1.0e-5,
        max_iter=50,
        max_al_iter=20,
        con_tol=0.001,
        rho_init=1.0,
        rho_scale=10.0,
    )

    x0 = jnp.zeros(NX, dtype)
    key = jax.random.PRNGKey(1)
    us_init = 1.0e-3 * jax.random.normal(key, (T - 1, NU), dtype)
    return prob, x0, us_init, opts


def build_deploy_problem(on_tpu: bool, dtype=None, fused: bool = True):
    """Deploy-tier acrobot-with-joint-limits swing-up at the reference
    configuration (T=101, h=0.05, /root/reference/examples/acrobot.jl)
    wired for the segmented executor: f32 IP tolerances at the chip
    floor, fused Pallas lane-batched solves (nz=6 — well inside the
    kernel's register budget), warm derivative sweeps + cold
    line-search rollouts. con_tol relaxes 0.001 -> 0.01 on the f32
    tier like the other deploy builders."""
    import dataclasses

    from optimization_dynamics_tpu.solver.interior_point import IPOptions

    if dtype is None:
        dtype = jnp.float32 if on_tpu else jnp.float64
    prob, x0, us0, opts = build_problem("impact", dtype=dtype)
    aux = acrobot.AcrobotAux(h=H)
    if on_tpu:
        ip = dict(r_tol=3.0e-5, kappa_tol=1.0e-3, max_iter=40, max_ls=8)
        # one-stage kappa continuation (the cartpole round-5 champion;
        # A/B-gated here too — see bench logs)
        if os.environ.get("ODX_ACROBOT_KSCHED", "1") == "1":
            ip.update(kappa_scale=0.01, kappa_init_max=0.3,
                      center_frac=0.2)
    else:
        ip = dict(r_tol=1.0e-8, kappa_tol=1.0e-3, max_iter=40, max_ls=8)
        fused = False
    dyn = make_implicit_dynamics(
        acrobot.impact_model(),
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
                               alpha_min=1.0e-2, grad_tol=1.0e-3)
    return prob, x0, us0, opts


def run(mode: str = "impact"):
    prob, x0, us_init, opts = build_problem(mode)
    res = jax.jit(lambda x, u: solve(prob, x, u, opts))(x0, us_init)
    return prob, res


def main():
    import numpy as np
    prob, res = run("impact")
    print("iterations:", int(res.iterations),
          "al_iterations:", int(res.al_iterations))
    print("objective:", float(res.objective))
    print("AL objective:", float(res.al_objective))
    print("terminal violation:",
          float(jnp.max(jnp.abs(res.xs[-1] -
                                jnp.array([np.pi, 0, np.pi, 0])))))
    print("converged:", bool(res.converged))
    from optimization_dynamics_tpu.dynamics import state_to_configuration
    from optimization_dynamics_tpu.utils.viz import maybe_visualize
    maybe_visualize("acrobot", state_to_configuration(res.xs), dt=H)


if __name__ == "__main__":
    main()
