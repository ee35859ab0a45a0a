"""Raibert-style planar hopper with body/foot contact, friction and leg
length limits.

TPU-native reconstruction of the ``RoboDojo.hopper`` model used wholesale
by the reference (/root/reference/examples/hopper.jl:14,39-43; structure
pinned by /root/reference/examples/comparisons/hopper.jl:6-162):

  * q = [x_body, z_body, theta (body/leg angle), r (leg length)];
  * u = [attitude torque, leg force];
  * four unilateral constraints — body-ground, foot-ground, leg max/min
    length (signed_distance -> 4 rows, comparisons/hopper.jl:74,103);
  * friction only on the body and foot contacts (nb = 2), with the body
    tangential force producing a moment body_radius * b1 on theta
    (comparisons/hopper.jl:27-30);
  * foot kinematics [x + r sin(theta), z - r cos(theta)]
    (``RoboDojo.kinematics_foot``).

The smooth mechanics are derived by autodiff of the Lagrangian — the
idiomatic JAX replacement for RoboDojo's hand-coded mass matrix / bias
(D1L = dL/dq, D2L = dL/dv feed the same midpoint variational integrator).

Variable layout (mirrors RoboDojo's IndicesZ pattern):
    z = [q2 (0:4), gamma (4:8), s_gamma (8:12), psi (12:14), b (14:16),
         s_psi (16:18), s_b (18:20)]                        nz = 20
Problem data (friction coefficients in theta, RoboDojo initialize_theta!):
    theta = [q0 (4), q1 (4), u (2), mu_body, mu_foot, h]    ntheta = 13
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from optimization_dynamics_tpu.ops.cones import ConeSpec, cone_product

NQ, NU, NC, NB = 4, 2, 4, 2
NZ = NQ + 2 * NC + 4 * NB      # 20
NTHETA = 2 * NQ + NU + 2 + 1   # 13


class HopperParams(NamedTuple):
    mass_body: float = 1.0
    mass_foot: float = 0.2
    inertia_body: float = 0.1
    body_radius: float = 0.1
    foot_radius: float = 0.05
    leg_len_max: float = 1.0
    leg_len_min: float = 0.1
    gravity: float = 9.81
    friction_body: float = 0.5
    friction_foot: float = 0.5


def kinematics_foot(p: HopperParams, q):
    """Foot position (``RoboDojo.kinematics_foot``,
    used at /root/reference/examples/hopper.jl:241-242)."""
    return jnp.array([q[0] + q[3] * jnp.sin(q[2]),
                      q[1] - q[3] * jnp.cos(q[2])])


def lagrangian(p: HopperParams, q, v):
    pf_dot = jax.jvp(lambda q: kinematics_foot(p, q), (q,), (v,))[1]
    ke = (0.5 * p.mass_body * (v[0] ** 2 + v[1] ** 2)
          + 0.5 * p.inertia_body * v[2] ** 2
          + 0.5 * p.mass_foot * jnp.dot(pf_dot, pf_dot))
    pe = (p.mass_body * p.gravity * q[1]
          + p.mass_foot * p.gravity * kinematics_foot(p, q)[1])
    return ke - pe


def signed_distance(p: HopperParams, q):
    """[body-ground, foot-ground, leg max, leg min] >= 0."""
    foot_z = q[1] - q[3] * jnp.cos(q[2])
    return jnp.array([
        q[1] - p.body_radius,
        foot_z - p.foot_radius,
        p.leg_len_max - q[3],
        q[3] - p.leg_len_min,
    ])


def contact_jacobian(p: HopperParams, q):
    """Rows: [body x; foot x; leg-max; leg-min] tangential/normal mapping
    is assembled in ``residual``; here we give the full force map J (6x4)
    with rows (body_x, body_z, foot_x, foot_z, leg_max, leg_min)."""
    st, ct = jnp.sin(q[2]), jnp.cos(q[2])
    r = q[3]
    return jnp.array([
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [1.0, 0.0, r * ct, st],
        [0.0, 1.0, r * st, -ct],
        [0.0, 0.0, 0.0, -1.0],
        [0.0, 0.0, 0.0, 1.0],
    ])


def input_matrix():
    B = jnp.zeros((NQ, NU))
    return B.at[2, 0].set(1.0).at[3, 1].set(1.0)


def unpack_z(z):
    q2 = z[0:4]
    gam = z[4:8]
    s_gam = z[8:12]
    psi = z[12:14]
    b = z[14:16]
    s_psi = z[16:18]
    s_b = z[18:20]
    return q2, gam, s_gam, psi, b, s_psi, s_b


def pack_theta(q0, q1, u, friction, h):
    return jnp.concatenate([q0, q1, u, jnp.asarray(friction).reshape(2),
                            jnp.atleast_1d(h)])


def residual(p: HopperParams, z, theta, kappa):
    q0 = theta[0:4]
    q1 = theta[4:8]
    u = theta[8:10]
    mu_body = theta[10]
    mu_foot = theta[11]
    h = theta[12]
    q2, gam, s_gam, psi, b, s_psi, s_b = unpack_z(z)

    d1l = jax.grad(lambda q, v: lagrangian(p, q, v), argnums=0)
    d2l = jax.grad(lambda q, v: lagrangian(p, q, v), argnums=1)

    qm1, vm1 = 0.5 * (q0 + q1), (q1 - q0) / h
    qm2, vm2 = 0.5 * (q1 + q2), (q2 - q1) / h

    J = contact_jacobian(p, q2)
    # generalized contact force: tangential b on body/foot x-rows, normal
    # gamma on z-rows, leg-limit gammas on r; body friction adds a moment
    # (comparisons/hopper.jl:27-30)
    f_body = jnp.array([b[0], gam[0]])
    f_foot = jnp.array([b[1], gam[1]])
    lam = (J[0:2].T @ f_body + J[2:4].T @ f_foot
           + J[4] * gam[2] + J[5] * gam[3])
    lam = lam.at[2].add(p.body_radius * b[0])

    d = (0.5 * h * d1l(qm1, vm1) + d2l(qm1, vm1)
         + 0.5 * h * d1l(qm2, vm2) - d2l(qm2, vm2)
         + input_matrix() @ u + lam)

    # tangential slip velocities (body rolls at body_radius; foot x)
    v2 = (q2 - q1) / h
    vt_body = v2[0] + p.body_radius * v2[2]
    vt_foot = jnp.dot(jax.jacfwd(
        lambda q: kinematics_foot(p, q))(q2)[0], v2)
    vT = jnp.array([vt_body, vt_foot])

    kvec2 = jnp.stack([jnp.asarray(kappa) * jnp.ones(()), jnp.zeros(())])
    return jnp.concatenate([
        d,
        s_gam - signed_distance(p, q2),
        jnp.array([psi[0] - mu_body * gam[0],
                   psi[1] - mu_foot * gam[1]]),
        s_b - vT,
        gam * s_gam - kappa,
        cone_product(jnp.stack([psi[0], b[0]]),
                     jnp.stack([s_psi[0], s_b[0]])) - kvec2,
        cone_product(jnp.stack([psi[1], b[1]]),
                     jnp.stack([s_psi[1], s_b[1]])) - kvec2,
    ])


def cone_spec() -> ConeSpec:
    return ConeSpec(
        nz=NZ, ntheta=NTHETA,
        eq_rows=tuple(range(12)),
        ort_prim=(4, 5, 6, 7), ort_dual=(8, 9, 10, 11),
        ort_rows=(12, 13, 14, 15),
        soc_prim=((12, 14), (13, 15)),
        soc_dual=((16, 18), (17, 19)),
        soc_rows=((16, 17), (18, 19)),
    )


def init_z(q):
    tail = jnp.concatenate([
        jnp.ones(8, q.dtype),                      # gamma, s_gamma
        jnp.array([1.0, 1.0, 0.1, 0.1], q.dtype),  # psi, b
        jnp.array([1.0, 1.0, 0.1, 0.1], q.dtype),  # s_psi, s_b
    ])
    return jnp.concatenate([q, tail])


class HopperAux(NamedTuple):
    h: float
    friction: jnp.ndarray = None   # (2,) [mu_body, mu_foot]


def model(params: HopperParams = HopperParams()):
    from optimization_dynamics_tpu.dynamics import ImplicitModel

    def res(z, theta, kappa):
        return residual(params, z, theta, kappa)

    def theta_fn(q0, q1, u, aux: HopperAux):
        friction = (jnp.array([params.friction_body, params.friction_foot],
                              q0.dtype)
                    if aux.friction is None else aux.friction)
        return pack_theta(q0, q1, u, friction, jnp.asarray(aux.h, q0.dtype))

    return ImplicitModel(
        nq=NQ, nu=NU, nz=NZ, ntheta=NTHETA,
        residual=res,
        spec=cone_spec(),
        init_z=init_z,
        theta_fn=theta_fn,
        q_sel=tuple(range(NQ)),
        th_q0=tuple(range(4)), th_q1=tuple(range(4, 8)),
        th_u=(8, 9),
    )
