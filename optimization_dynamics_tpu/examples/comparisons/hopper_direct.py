"""Comparison: hopper gait via direct contact-implicit transcription.

Parity with /root/reference/examples/comparisons/hopper.jl — the baseline
the paper argues against: contact forces gamma(4), friction beta(4),
psi(2), eta(4) and the complementarity slack s_alpha are *explicit
decision variables* with complementarity inequality constraints, solved
as one big NLP (reference uses DTO/Ipopt at tol 1e-2; here the dense
AL Gauss-Newton solver in solver/direct.py).

Decision vector per stage t = 1..T-1:
    [q3_t (4), u_t (2), gamma_t (4), beta_t (4), psi_t (2), eta_t (4),
     s_alpha_t (1)]                                   -> 21 vars/stage
States chain via configurations: (q1, q2) fixed at t=0; q3_t becomes the
next stage's q2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from optimization_dynamics_tpu.models import hopper as hp
from optimization_dynamics_tpu.solver.direct import (
    DirectOptions,
    DirectProblem,
    solve_direct,
)

H = 0.05
T = 21
NQ = hp.NQ
NW_STAGE = NQ + 2 + 4 + 4 + 2 + 4 + 1    # 21


def _split_stage(ws):
    q3 = ws[0:4]
    u = ws[4:6]
    gam = ws[6:10]
    beta = ws[10:14]
    psi = ws[14:16]
    eta = ws[16:20]
    s_alpha = ws[20]
    return q3, u, gam, beta, psi, eta, s_alpha


def build_problem(params: hp.HopperParams = hp.HopperParams(),
                  dtype=jnp.float64):
    q_init = jnp.array([0.0, 0.5 + params.foot_radius, 0.0, 0.5], dtype)
    q_ref = jnp.array([0.5, 0.75 + params.foot_radius, 0.0, 0.25], dtype)

    d1l = jax.grad(lambda q, v: hp.lagrangian(params, q, v), argnums=0)
    d2l = jax.grad(lambda q, v: hp.lagrangian(params, q, v), argnums=1)

    def dynamics_defect(q1, q2, q3, u, gam, beta):
        """Variational integrator with explicit contact forces
        (comparisons/hopper.jl:6-37 structure)."""
        qm1, vm1 = 0.5 * (q1 + q2), (q2 - q1) / H
        qm2, vm2 = 0.5 * (q2 + q3), (q3 - q2) / H
        J = hp.contact_jacobian(params, q3)
        b_body = beta[0] - beta[1]
        b_foot = beta[2] - beta[3]
        lam = (J[0:2].T @ jnp.stack([b_body, gam[0]])
               + J[2:4].T @ jnp.stack([b_foot, gam[1]])
               + J[4] * gam[2] + J[5] * gam[3])
        lam = lam.at[2].add(params.body_radius * b_body)
        return (0.5 * H * d1l(qm1, vm1) + d2l(qm1, vm1)
                + 0.5 * H * d1l(qm2, vm2) - d2l(qm2, vm2)
                + hp.input_matrix() @ u + lam)

    n = (T - 1) * NW_STAGE

    def stages(w):
        return w.reshape(T - 1, NW_STAGE)

    def config_chain(w):
        """(q1_t, q2_t) pairs for each stage."""
        q3s = stages(w)[:, 0:4]
        q2s = jnp.concatenate([q_init[None], q3s[:-1]], axis=0)
        q1s = jnp.concatenate([q_init[None], q2s[:-1]], axis=0)
        return q1s, q2s, q3s

    w8 = jnp.array([1.0, 10.0, 1.0, 10.0, 1.0, 10.0, 1.0, 10.0], dtype)
    r_cost, q_cost = 1.0e-1, 1.0e-1

    def objective(w):
        q1s, q2s, q3s = config_chain(w)
        xs = jnp.concatenate([q2s, q3s], axis=1)
        x_ref = jnp.concatenate([q_ref, q_ref])
        dx = xs - x_ref
        s_alphas = stages(w)[:, 20]
        us = stages(w)[:, 4:6]
        return (0.5 * q_cost * jnp.sum(dx * (w8 * dx))
                + 0.5 * r_cost * jnp.sum(us * us)
                + 1000.0 * jnp.sum(s_alphas))

    mu = jnp.array([params.friction_body, params.friction_foot], dtype)

    def per_stage_eq(q1, q2, ws):
        q3, u, gam, beta, psi, eta, s_alpha = _split_stage(ws)
        defect = dynamics_defect(q1, q2, q3, u, gam, beta)
        v = (q3 - q2) / H
        vt_body = v[0] + params.body_radius * v[2]
        vt_foot = jnp.dot(
            jax.jacfwd(lambda q: hp.kinematics_foot(params, q))(q3)[0], v)
        vT = jnp.array([vt_body, -vt_body, vt_foot, -vt_foot])
        psi_stack = jnp.array([psi[0], psi[0], psi[1], psi[1]])
        return jnp.concatenate([defect, eta - vT - psi_stack])

    def per_stage_ineq(q1, q2, ws):
        q3, u, gam, beta, psi, eta, s_alpha = _split_stage(ws)
        phi = hp.signed_distance(params, q3)
        fc = mu * gam[0:2] - jnp.array([beta[0] + beta[1],
                                        beta[2] + beta[3]])
        return jnp.concatenate([
            -phi,                        # contact separation >= 0
            -fc,                         # friction cone slack >= 0
            -gam, -beta, -psi, -eta,     # nonnegativity
            jnp.array([-s_alpha]),
            beta * eta - s_alpha,        # complementarity (relaxed)
            psi * fc - s_alpha,
            gam * phi - s_alpha,
        ])

    x_travel = 0.5

    def eq_con(w):
        q1s, q2s, q3s = config_chain(w)
        rows = jax.vmap(per_stage_eq)(q1s, q2s, stages(w))
        # gait terminal: body height / attitude / leg return to start
        # (comparisons/hopper.jl:270-282, with the initial state pinned)
        terminal = q3s[-1][1:4] - q_init[1:4]
        return jnp.concatenate([rows.reshape(-1), terminal])

    def ineq_con(w):
        q1s, q2s, q3s = config_chain(w)
        rows = jax.vmap(per_stage_ineq)(q1s, q2s, stages(w))
        travel = jnp.array([x_travel - q3s[-1][0]])   # travel >= 0.5
        return jnp.concatenate([rows.reshape(-1), travel])

    prob = DirectProblem(n=n, objective=objective, eq_con=eq_con,
                         ineq_con=ineq_con)
    opts = DirectOptions(con_tol=1.0e-2, grad_tol=1.0e-4,
                         max_iter=50, max_al_iter=8)

    # standing warm start with small positive contact variables
    w0 = jnp.zeros((T - 1, NW_STAGE), dtype)
    w0 = w0.at[:, 0:4].set(q_init)
    w0 = w0.at[:, 5].set(params.gravity * params.mass_body * 0.5 * H)
    w0 = w0.at[:, 6:20].set(0.1)
    w0 = w0.at[:, 20].set(0.1)
    return prob, w0.reshape(-1), opts


def run():
    prob, w0, opts = build_problem()
    res = jax.jit(lambda w: solve_direct(prob, w, opts))(w0)
    return prob, res


def main():
    prob, res = run()
    w = np.asarray(res.w).reshape(T - 1, NW_STAGE)
    print("converged:", bool(res.converged),
          "obj:", round(float(res.objective), 4),
          "vio: %.2e" % float(res.constraint_violation),
          "iters:", int(res.iterations))
    print("final config:", np.round(w[-1, 0:4], 4))
    print("complementarity slack sum:", float(np.sum(w[:, 20])))


if __name__ == "__main__":
    main()
