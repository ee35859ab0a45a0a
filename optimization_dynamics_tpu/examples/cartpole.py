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
