"""Acrobot (double pendulum, elbow-actuated) with hard joint limits.

TPU-native re-implementation of the reference model
/root/reference/src/models/acrobot/model.jl — the smallest
optimization-based-dynamics problem (nz=6): the elbow joint limits
``-pi/2 <= q2 <= pi/2`` enter the step as an impact complementarity.

Variable layout (Impact variant, cf. simulator_impact.jl:1-14):
    z = [q2 (2), lambda (2), s (2)]          nz = 6
Problem data:
    theta = [q0 (2), q1 (2), u (1), h (1)]   ntheta = 6
Residual rows (model.jl:121-142):
    [variational dynamics (2); s - phi(q2) (2); lambda .* s - kappa (2)]
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from optimization_dynamics_tpu.models.base import variational_dynamics
from optimization_dynamics_tpu.ops.cones import ConeSpec

NQ, NU, NC = 2, 1, 2
NZ_IMPACT = NQ + 2 * NC          # 6
NZ_NOMINAL = NQ                  # 2
NTHETA = 2 * NQ + NU + 1         # 6


class AcrobotParams(NamedTuple):
    m1: float = 1.0
    j1: float = 0.333
    l1: float = 1.0
    lc1: float = 0.5
    m2: float = 1.0
    j2: float = 0.333
    l2: float = 1.0
    lc2: float = 0.5
    gravity: float = 9.81


def kinematics(p: AcrobotParams, q):
    return jnp.array([
        p.l1 * jnp.sin(q[0]) + p.l2 * jnp.sin(q[0] + q[1]),
        -p.l1 * jnp.cos(q[0]) - p.l2 * jnp.cos(q[0] + q[1]),
    ])


def mass_matrix(p: AcrobotParams, q):
    a = (p.j1 + p.j2 + p.m2 * p.l1 * p.l1
         + 2.0 * p.m2 * p.l1 * p.lc2 * jnp.cos(q[1]))
    b = p.j2 + p.m2 * p.l1 * p.lc2 * jnp.cos(q[1])
    return jnp.array([[a, b], [b, p.j2]])


def _tau(p: AcrobotParams, q):
    a = (-p.m1 * p.gravity * p.lc1 * jnp.sin(q[0])
         - p.m2 * p.gravity * (p.l1 * jnp.sin(q[0])
                               + p.lc2 * jnp.sin(q[0] + q[1])))
    b = -p.m2 * p.gravity * p.lc2 * jnp.sin(q[0] + q[1])
    return jnp.array([a, b])


def _coriolis(p: AcrobotParams, q, v):
    # C(q,v) v written out in scalar form — NOT a 2x2 matmul: inside the
    # fused Pallas kernel the vmap(jvp(dot_general)) chain this produces
    # hits a Mosaic "infer-vector-layout: unsupported shape cast"
    # (tpu.reshape 128x12 -> 128x6x2, logs/bench_r4_acrobot_run1.log);
    # elementwise forms lower cleanly (same fix class as
    # planar_push._matvec).
    k = p.m2 * p.l1 * p.lc2 * jnp.sin(q[1])
    return jnp.stack([
        -2.0 * k * v[1] * v[0] - k * v[1] * v[1],
        k * v[0] * v[0],
    ])


def dynamics_bias(p: AcrobotParams, q, v):
    return _coriolis(p, q, v) - _tau(p, q)


def signed_distance(q):
    """Elbow joint limits: phi = [pi/2 - q2; q2 + pi/2] >= 0."""
    return jnp.array([0.5 * jnp.pi - q[1], q[1] + 0.5 * jnp.pi])


def limit_jacobian():
    return jnp.array([[0.0, -1.0], [0.0, 1.0]])


def control_force(u):
    return jnp.array([0.0, u[0]])


def unpack_theta(theta):
    q0 = theta[0:NQ]
    q1 = theta[NQ:2 * NQ]
    u = theta[2 * NQ:2 * NQ + NU]
    h = theta[2 * NQ + NU]
    return q0, q1, u, h


def pack_theta(q0, q1, u, h):
    return jnp.concatenate([q0, q1, u, jnp.atleast_1d(h)])


def residual_impact(p: AcrobotParams, z, theta, kappa):
    """Joint-limit impact residual (model.jl:121-142)."""
    q0, q1, u, h = unpack_theta(theta)
    q2 = z[0:NQ]
    lam = z[NQ:NQ + NC]
    s = z[NQ + NC:NQ + 2 * NC]

    d = variational_dynamics(
        lambda q: mass_matrix(p, q),
        lambda q, v: dynamics_bias(p, q, v),
        h, q0, q1, q2,
        control_force(u),
        # J^T lam as multiply+reduce (dot-free for the Mosaic kernel
        # path; see _coriolis)
        contact_force=jnp.sum(limit_jacobian().T * lam[None, :], axis=1),
        damping=0.5,
    )
    return jnp.concatenate([
        d,
        s - signed_distance(q2),
        lam * s - kappa,
    ])


def residual_nominal(p: AcrobotParams, z, theta, kappa):
    """Smooth (no joint limit) residual (model.jl:144-157)."""
    q0, q1, u, h = unpack_theta(theta)
    q2 = z[0:NQ]
    d = variational_dynamics(
        lambda q: mass_matrix(p, q),
        lambda q, v: dynamics_bias(p, q, v),
        h, q0, q1, q2,
        control_force(u),
        damping=0.5,
    )
    return d


def cone_spec_impact() -> ConeSpec:
    """Orthant pairs (lambda_i, s_i); rows 0..3 equality, 4..5 bilinear
    (cf. simulator_impact.jl:16-32)."""
    return ConeSpec(
        nz=NZ_IMPACT,
        ntheta=NTHETA,
        eq_rows=(0, 1, 2, 3),
        ort_prim=(2, 3),
        ort_dual=(4, 5),
        ort_rows=(4, 5),
    )


def cone_spec_nominal() -> ConeSpec:
    return ConeSpec(nz=NZ_NOMINAL, ntheta=NTHETA,
                    eq_rows=(0, 1))


def init_z_impact(q):
    """Warm start: z = [q; 1; 1; 1; 1] (simulator_impact.jl:34-38)."""
    return jnp.concatenate([q, jnp.ones(2 * NC, q.dtype)])


def init_z_nominal(q):
    return q


class AcrobotAux(NamedTuple):
    """Scenario parameters threaded through theta (vmappable)."""
    h: float


def impact_model(params: AcrobotParams = AcrobotParams()):
    """Build the joint-limit ``ImplicitModel``."""
    from optimization_dynamics_tpu.dynamics import ImplicitModel

    def residual(z, theta, kappa):
        return residual_impact(params, z, theta, kappa)

    def theta_fn(q0, q1, u, aux: AcrobotAux):
        return pack_theta(q0, q1, u, jnp.asarray(aux.h, q0.dtype))

    return ImplicitModel(
        nq=NQ, nu=NU, nz=NZ_IMPACT, ntheta=NTHETA,
        residual=residual,
        spec=cone_spec_impact(),
        init_z=init_z_impact,
        theta_fn=theta_fn,
        q_sel=(0, 1),
        th_q0=(0, 1), th_q1=(2, 3), th_u=(4,),
    )


def nominal_model(params: AcrobotParams = AcrobotParams()):
    """Build the smooth (no joint limit) ``ImplicitModel``."""
    from optimization_dynamics_tpu.dynamics import ImplicitModel

    def residual(z, theta, kappa):
        return residual_nominal(params, z, theta, kappa)

    def theta_fn(q0, q1, u, aux: AcrobotAux):
        return pack_theta(q0, q1, u, jnp.asarray(aux.h, q0.dtype))

    return ImplicitModel(
        nq=NQ, nu=NU, nz=NZ_NOMINAL, ntheta=NTHETA,
        residual=residual,
        spec=cone_spec_nominal(),
        init_z=init_z_nominal,
        theta_fn=theta_fn,
        q_sel=(0, 1),
        th_q0=(0, 1), th_q1=(2, 3), th_u=(4,),
    )
