"""Rocket soft landing with thrust-cone limits.

Parity with /root/reference/examples/rocket.jl: h=0.05, T=61, u_max=12.5,
initial tilt RotZ(pi/4)*RotY(-pi/2) at (2.5, 2.5, 10) falling at 1 m/s,
goal upright at the pad. Two modes:
  * "projection": thrust cone enforced inside the dynamics via the
    differentiable SOC projection (the paper's approach);
  * "nominal": thrust limits as iLQR box inequality constraints.
"""

from __future__ import annotations

import math
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from optimization_dynamics_tpu.models import rocket
from optimization_dynamics_tpu.solver.ilqr import (
    ILQROptions,
    ILQRProblem,
    solve,
)

H = 0.05
T = 61
U_MAX = 12.5
NX, NU = rocket.NX, rocket.NU


def _quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def mrp_from_rotzy(alpha: float, beta: float) -> np.ndarray:
    """MRP of RotZ(alpha) * RotY(beta) (Rotations.jl convention,
    /root/reference/examples/rocket.jl:48)."""
    qz = np.array([math.cos(alpha / 2), 0.0, 0.0, math.sin(alpha / 2)])
    qy = np.array([math.cos(beta / 2), 0.0, math.sin(beta / 2), 0.0])
    q = _quat_mul(qz, qy)
    if q[0] < 0:
        q = -q
    return q[1:] / (1.0 + q[0])


def initial_and_goal(dtype=jnp.float64) -> Tuple[jnp.ndarray, jnp.ndarray]:
    params = rocket.RocketParams()
    x1 = np.zeros(NX)
    x1[0], x1[1], x1[2] = 2.5, 2.5, 10.0
    x1[3:6] = mrp_from_rotzy(0.25 * np.pi, -0.5 * np.pi)
    x1[8] = -1.0
    xT = np.zeros(NX)
    xT[2] = params.length
    xT[3:6] = mrp_from_rotzy(0.25 * np.pi, 0.0)
    return jnp.asarray(x1, dtype), jnp.asarray(xT, dtype)


def build_problem(mode: str = "projection", dtype=jnp.float64):
    params = rocket.RocketParams()
    projection = mode == "projection"
    dyn = rocket.make_rocket_dynamics(params, u_max=U_MAX, h=H,
                                      projection=projection)
    x1, xT = initial_and_goal(dtype)

    qw = H * jnp.concatenate([
        1.0e-1 * jnp.ones(3), 1.0e-5 * jnp.ones(3),
        1.0e-1 * jnp.ones(3), 1000.0 * jnp.ones(3)]).astype(dtype)
    rw = H * jnp.array([1000.0, 1000.0, 100.0], dtype)
    qwT = H * 1000.0 * jnp.ones(NX, dtype)

    def stage_cost(t, x, u):
        dx = x - xT
        return 0.5 * dx @ (qw * dx) + 0.5 * u @ (rw * u)

    def terminal_cost(x):
        dx = x - xT
        return 0.5 * dx @ (qwT * dx)

    x_con = (-0.5, 0.5)
    y_con = (-0.75, 0.75)

    if projection:
        ncon = 1

        def stage_con(t, x, u):
            return jnp.array([params.length - x[2]])

        ineq = jnp.ones((T - 1, 1), bool)
    else:
        ncon = 7

        def stage_con(t, x, u):
            return jnp.concatenate([
                jnp.array([-1.0 - u[0], u[0] - 1.0,
                           -1.0 - u[1], u[1] - 1.0,
                           0.0 - u[2], u[2] - U_MAX,
                           params.length - x[2]])])

        ineq = jnp.ones((T - 1, 7), bool)

    def terminal_con(x):
        return jnp.concatenate([
            jnp.array([x_con[0] - x[0], x[0] - x_con[1],
                       y_con[0] - x[1], x[1] - y_con[1]]),
            (x - xT)[2:12],
        ])

    ineqT = jnp.zeros(14, bool).at[:4].set(True)

    prob = ILQRProblem(
        T=T, nx=NX, nu=NU, ncon=ncon, nconT=14,
        dynamics=lambda t, x, u: dyn.step(x, u),
        dynamics_jac=lambda t, x, u: dyn.step_jac(x, u),
        stage_cost=stage_cost,
        terminal_cost=terminal_cost,
        stage_con=stage_con,
        terminal_con=terminal_con,
        ineq_mask=ineq,
        terminal_ineq_mask=ineqT,
    )

    opts = ILQROptions(
        alpha_min=1.0e-5,
        obj_tol=1.0e-3,
        grad_tol=1.0e-3,
        max_iter=100,
        max_al_iter=15,
        con_tol=0.005,
        rho_init=1.0,
        rho_scale=10.0,
    )

    key = jax.random.PRNGKey(1)
    us_init = 1.0e-3 * jax.random.normal(key, (T - 1, NU), dtype)
    return prob, x1, us_init, opts, dyn


def build_deploy_problem(on_tpu: bool, mode: str = "projection",
                         dtype=None):
    """Deploy-tier rocket problem (VERDICT r4 #4): the reference
    configuration with the lane-batched two-IP step (cold SOC
    projection chained into the warm-startable implicit-midpoint
    solve, models/rocket.py) wired for ``solve_batched`` and the
    segmented executor. On TPU the IP tolerance sits at the f32 floor
    and con_tol relaxes to 0.01 (the same deploy numerics as
    cartpole/planar push)."""
    import dataclasses

    if dtype is None:
        dtype = jnp.float32 if on_tpu else jnp.float64
    prob, x1, us0, opts, _ = build_problem(mode, dtype=dtype)
    params = rocket.RocketParams()
    r_tol = 3.0e-5 if on_tpu else 1.0e-8
    dyn = rocket.make_rocket_dynamics(
        params, u_max=U_MAX, h=H, projection=(mode == "projection"),
        r_tol=r_tol, proj_kappa_tol=1.0e-4)
    prob = prob._replace(
        dynamics=lambda t, x, u: dyn.step(x, u),
        dynamics_jac=lambda t, x, u: dyn.step_jac(x, u),
        dynamics_batched=lambda t, xs, us: dyn.step_batched(xs, us),
        dynamics_jac_batched=lambda ts, xs, us: dyn.step_jac_batched(
            xs, us),
        dynamics_batched_ws=lambda t, xs, us, ws: dyn.step_batched_ws(
            xs, us, ws),
        dynamics_jac_batched_ws=lambda ts, xs, us, wss:
            dyn.step_jac_batched_ws(xs, us, wss),
        ws_init_batched=lambda t, xs, us: dyn.ws_init_batched(xs),
        # cold line-search rollouts (deploy policy; the implicit
        # midpoint has no complementarity branches, but y=x inits are
        # already ~1 Newton step from the solution)
        ws_linesearch=False)
    if on_tpu:
        opts = dataclasses.replace(opts, con_tol=0.01, rho_max=1.0e6,
                                   alpha_min=1.0e-2)
    return prob, x1, us0.astype(dtype), opts


def run(mode: str = "projection"):
    prob, x1, us_init, opts, dyn = build_problem(mode)
    res = jax.jit(lambda x, u: solve(prob, x, u, opts))(x1, us_init)
    return prob, res, dyn


def main():
    for mode in ("projection",):
        prob, res, dyn = run(mode)
        _, xT = initial_and_goal()
        us = np.asarray(res.us)
        if mode == "projection":
            us_eff = np.asarray(
                jax.vmap(dyn.project)(jnp.asarray(us)))
        else:
            us_eff = us
        cone_ok = bool(np.all(np.linalg.norm(us_eff[:, :2], axis=1)
                              <= us_eff[:, 2] + 1e-6))
        print(f"[{mode}] converged: {bool(res.converged)}"
              f" obj: {float(res.objective):.4f}"
              f" iters: {int(res.iterations)}"
              f" al: {int(res.al_iterations)}"
              f" vio: {float(res.constraint_violation):.2e}"
              f" thrust-cone feasible: {cone_ok}")
        print("final state err:",
              float(np.max(np.abs(np.asarray(res.xs[-1] - xT)[2:]))))
        viz_dir = os.environ.get("ODX_VIZ_DIR")
        if viz_dir:
            from optimization_dynamics_tpu.utils.viz import (
                visualize_rocket_3d)
            os.makedirs(viz_dir, exist_ok=True)
            out = visualize_rocket_3d(
                np.asarray(res.xs), os.path.join(viz_dir, "rocket_3d.html"),
                us=us_eff, dt=H)
            print("3-D player:", out)


if __name__ == "__main__":
    main()
