"""6-DoF rocket with implicit-midpoint dynamics and a differentiable
second-order-cone thrust projection.

TPU-native re-implementation of /root/reference/src/models/rocket/
{model.jl, dynamics.jl, codegen.jl}. Two embedded solves per step
(dynamics.jl:215-268 — the paper's "projection-in-the-dynamics" trick):

  1. thrust projection: u_hat = argmin ||u - u_bar|| s.t.
     ||u_xy|| <= u_z <= u_max — a 10-variable SOC KKT system
     (codegen.jl:45-64);
  2. dynamics: implicit midpoint y = x + h f((x+y)/2, u_hat) — a
     12-variable equality system (codegen.jl:14-22).

Chain rule: du = dz_dyn[:, u-cols] @ dproj/du (dynamics.jl:254-268).

State x = [position (3), MRP attitude (3), velocity (3), body rates (3)].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from optimization_dynamics_tpu.ops.cones import ConeSpec, cone_product
from optimization_dynamics_tpu.solver.interior_point import (
    IPOptions,
    make_sensitivity,
    make_sensitivity_batched,
    make_solver,
    make_solver_batched,
)

NX, NU = 12, 3
NZ_DYN = NX
NTHETA_DYN = NX + NU + 1      # 16
NZ_PROJ = 10
NTHETA_PROJ = 4


class RocketParams(NamedTuple):
    mass: float = 1.0
    length: float = 1.0        # COM-to-thruster
    inertia: tuple = (1.0 / 12.0, 1.0 / 12.0, 1.0e-5)
    gravity: float = 9.81


def _skew(v):
    return jnp.array([[0.0, -v[2], v[1]],
                      [v[2], 0.0, -v[0]],
                      [-v[1], v[0], 0.0]])


def mrp_rotation(p):
    """Rotation matrix of a Modified Rodrigues Parameter (matches
    Rotations.jl ``MRP`` used at
    /root/reference/src/models/rocket/model.jl:31)."""
    pp = jnp.dot(p, p)
    S = _skew(p)
    return (jnp.eye(3)
            + (4.0 * (1.0 - pp) * S + 8.0 * S @ S) / (1.0 + pp) ** 2)


def ode(params: RocketParams, x, u):
    """Continuous dynamics (model.jl:14-33)."""
    r = x[3:6]
    v = x[6:9]
    w = x[9:12]
    J = jnp.asarray(params.inertia)
    F = u[0:3]
    tau = jnp.array([params.length * u[1], -params.length * u[0], 0.0])
    g = jnp.array([0.0, 0.0, -params.gravity])

    rdot = 0.25 * ((1.0 - jnp.dot(r, r)) * w - 2.0 * jnp.cross(w, r)
                   + 2.0 * jnp.dot(w, r) * r)
    vdot = g + mrp_rotation(r) @ F / params.mass
    wdot = (tau - jnp.cross(w, J * w)) / J
    return jnp.concatenate([v, rdot, vdot, wdot])


# ---------------------------------------------------------------------------
# implicit midpoint dynamics residual (equality-only)


def residual_dyn(params: RocketParams, z, theta, kappa):
    """y - x - h f((x+y)/2, u)  (codegen.jl:14-22)."""
    del kappa
    y = z
    x = theta[0:NX]
    u = theta[NX:NX + NU]
    h = theta[NX + NU]
    return y - x - h * ode(params, 0.5 * (x + y), u)


def cone_spec_dyn() -> ConeSpec:
    return ConeSpec(nz=NZ_DYN, ntheta=NTHETA_DYN,
                    eq_rows=tuple(range(NZ_DYN)))


# ---------------------------------------------------------------------------
# thrust-cone projection residual


def residual_proj(z, theta, kappa):
    """KKT of min ||u - u_bar|| s.t. ||u_xy|| <= u_z, u_z <= u_max
    (codegen.jl:45-64). z = [u(3), p, s, w, y, v(3)];
    theta = [u_bar(3), u_max]."""
    u = z[0:3]
    p = z[3]
    s = z[4]
    w = z[5]
    y = z[6]
    v = z[7:10]
    u_bar = theta[0:3]
    u_max = theta[3]

    ax = jnp.array([2, 0, 1])   # cone-axis-first ordering [u3, u1, u2]
    kvec = jnp.stack([jnp.asarray(kappa) * jnp.ones(()),
                      jnp.zeros(()), jnp.zeros(())])
    return jnp.concatenate([
        u - u_bar - v - jnp.array([0.0, 0.0, 1.0]) * (y + p),
        jnp.array([
            u_max - u[2] - s,
            -y - w,
            w * s - kappa,
            p * u[2] - kappa,
        ]),
        cone_product(u[ax], v[ax]) - kvec,
    ])


def cone_spec_proj() -> ConeSpec:
    """Orthant pairs (s,w), (u_z,p); one SOC(3)
    (/root/reference/src/models/rocket/dynamics.jl:52-63)."""
    return ConeSpec(
        nz=NZ_PROJ, ntheta=NTHETA_PROJ,
        eq_rows=(0, 1, 2, 3, 4),
        ort_prim=(4, 2), ort_dual=(5, 3), ort_rows=(5, 6),
        soc_prim=((2, 0, 1),), soc_dual=((9, 7, 8),),
        soc_rows=((7, 8, 9),),
    )


def init_z_proj(dtype=jnp.float64):
    """Cold start (dynamics.jl:169-172): all 0.1, cone axes 1.1, y = 0."""
    z = jnp.full((NZ_PROJ,), 0.1, dtype)
    z = z.at[2].add(1.0)
    z = z.at[9].add(1.0)
    z = z.at[6].set(0.0)
    return z


# ---------------------------------------------------------------------------
# assembled differentiable rocket dynamics


class RocketDynamics(NamedTuple):
    step: callable            # (x, u) -> y        [projection optional]
    step_jac: callable        # (x, u) -> (y, fx, fu)
    project: callable         # (u,) -> u_hat
    project_jac: callable     # (u,) -> (u_hat, du_hat/du)
    # lane-batched deploy tier (VERDICT r4 #4): the two chained IP
    # solves per step — projection (nz=10, cold per reference
    # dynamics.jl:169-172) then implicit midpoint (nz=12) — through the
    # batched-native lockstep solver, plus the warm-started variants
    # the segmented executor threads (ws = the dynamics solve's y,
    # warm-starting the SAME timestep's re-solve; the projection is
    # always cold by reference semantics)
    step_batched: callable        # (xs, us) -> ys
    step_jac_batched: callable    # (xs, us) -> (ys, fxs, fus)
    step_batched_ws: callable     # (xs, us, zs) -> (ys, zs')
    step_jac_batched_ws: callable  # (xs, us, zs) -> (ys, fxs, fus, zs')
    ws_init_batched: callable     # (xs,) -> zs  (y = x warm start)


def make_rocket_dynamics(params: RocketParams = RocketParams(),
                         u_max: float = 12.5, h: float = 0.05,
                         projection: bool = True,
                         r_tol: float = 1.0e-8,
                         proj_kappa_tol: float = 1.0e-4) -> RocketDynamics:
    """Build the (optionally projected) implicit-midpoint stepper.

    Mirrors ``RocketInfo`` (dynamics.jl:13-99): dynamics solved as an
    equality-only Newton system; projection solved per call from the
    reference cold start with kappa_tol=1e-4, IFT gradients at the relaxed
    point.
    """
    dyn_res = lambda z, th, k: residual_dyn(params, z, th, k)
    dyn_solve = make_solver(dyn_res, cone_spec_dyn(),
                            IPOptions(r_tol=r_tol, kappa_tol=1.0))
    dyn_sens = make_sensitivity(dyn_res, cone_spec_dyn())

    proj_solve = make_solver(
        residual_proj, cone_spec_proj(),
        IPOptions(r_tol=r_tol, kappa_tol=proj_kappa_tol))
    proj_sens = make_sensitivity(residual_proj, cone_spec_proj())

    u_cols = np.arange(NX, NX + NU)
    x_cols = np.arange(0, NX)

    def project(u):
        theta = jnp.concatenate([u, jnp.array([u_max], u.dtype)])
        sol = proj_solve(init_z_proj(u.dtype), theta)
        return sol.z[0:3]

    def project_jac(u):
        theta = jnp.concatenate([u, jnp.array([u_max], u.dtype)])
        sol = proj_solve(init_z_proj(u.dtype), theta)
        dz = proj_sens(sol.z, theta)
        return sol.z[0:3], dz[0:3, 0:3]

    def _dyn_solve(x, u_hat):
        theta = jnp.concatenate([x, u_hat, jnp.array([h], x.dtype)])
        sol = dyn_solve(x, theta)     # warm start y = x (dynamics.jl:103)
        return sol, theta

    def step(x, u):
        u_hat = project(u) if projection else u
        sol, _ = _dyn_solve(x, u_hat)
        return sol.z

    def step_jac(x, u):
        if projection:
            u_hat, dproj = project_jac(u)
        else:
            u_hat = u
        sol, theta = _dyn_solve(x, u_hat)
        dz = dyn_sens(sol.z, theta)
        fx = dz[:, x_cols]
        fu = dz[:, u_cols]
        if projection:
            fu = fu @ dproj
        return sol.z, fx, fu

    # ---- lane-batched deploy tier ----------------------------------
    dyn_solve_b = make_solver_batched(dyn_res, cone_spec_dyn(),
                                      IPOptions(r_tol=r_tol,
                                                kappa_tol=1.0))
    dyn_sens_b = make_sensitivity_batched(dyn_res, cone_spec_dyn())
    proj_solve_b = make_solver_batched(
        residual_proj, cone_spec_proj(),
        IPOptions(r_tol=r_tol, kappa_tol=proj_kappa_tol))
    proj_sens_b = make_sensitivity_batched(residual_proj,
                                           cone_spec_proj())

    def _project_b(us):
        B = us.shape[0]
        thetas = jnp.concatenate(
            [us, jnp.full((B, 1), u_max, us.dtype)], axis=1)
        z0s = jnp.broadcast_to(init_z_proj(us.dtype), (B, NZ_PROJ))
        return proj_solve_b(z0s, thetas), thetas

    def _dyn_solve_b(xs, u_hats, z0s):
        B = xs.shape[0]
        thetas = jnp.concatenate(
            [xs, u_hats, jnp.full((B, 1), h, xs.dtype)], axis=1)
        return dyn_solve_b(z0s, thetas), thetas

    def _u_hats(us):
        if projection:
            sol_p, _ = _project_b(us)
            return sol_p.z[:, 0:3]
        return us

    def step_batched(xs, us):
        sol, _ = _dyn_solve_b(xs, _u_hats(us), xs)
        return sol.z

    def step_batched_ws(xs, us, zs):
        sol, _ = _dyn_solve_b(xs, _u_hats(us), zs)
        return sol.z, sol.z

    def _jac_b(xs, us, z0s):
        if projection:
            sol_p, theta_p = _project_b(us)
            u_hats = sol_p.z[:, 0:3]
            dzp = proj_sens_b(sol_p.z, theta_p)
            dprojs = dzp[:, 0:3, 0:3]
        else:
            u_hats = us
        sol, thetas = _dyn_solve_b(xs, u_hats, z0s)
        dzs = dyn_sens_b(sol.z, thetas)
        fxs = dzs[:, :, x_cols]
        fus = dzs[:, :, u_cols]
        if projection:
            # chain rule through the projection (dynamics.jl:254-268)
            fus = jnp.einsum("biu,buv->biv", fus, dprojs)
        return sol.z, fxs, fus

    def step_jac_batched(xs, us):
        ys, fxs, fus = _jac_b(xs, us, xs)
        return ys, fxs, fus

    def step_jac_batched_ws(xs, us, zs):
        ys, fxs, fus = _jac_b(xs, us, zs)
        return ys, fxs, fus, ys

    def ws_init_batched(xs):
        return xs                 # warm start y = x (dynamics.jl:103)

    return RocketDynamics(step=step, step_jac=step_jac,
                          project=project, project_jac=project_jac,
                          step_batched=step_batched,
                          step_jac_batched=step_jac_batched,
                          step_batched_ws=step_batched_ws,
                          step_jac_batched_ws=step_jac_batched_ws,
                          ws_init_batched=ws_init_batched)
