"""Cartpole with joint friction on both the slider and the arm.

TPU-native re-implementation of /root/reference/src/models/cartpole/model.jl.
Each joint's Coulomb friction is a 2-dim second-order-cone complementarity:
the friction impulse ``b_i`` is bounded by ``psi_i`` (= mu_i * normal-load
impulse) and opposes the joint slip velocity through the cone product rows
(model.jl:81-114).

Variable layout (Friction variant, simulator_friction.jl:3-16):
    z = [q2 (2), psi (2), b (2), s_psi (2), s_b (2)]          nz = 10
Problem data (codegen.jl:7):
    theta = [q0 (2), q1 (2), u (1), mu_slider, mu_angle, h]   ntheta = 8
Residual rows:
    [dynamics (2);
     s_b1 - vT1; psi1 - mu_slider*(mp+mc)*g*h;
     s_b2 - vT2; psi2 - mu_angle*(mp*g*l)*h;
     cone([psi1,b1],[s_psi1,s_b1]) - [kappa,0];
     cone([psi2,b2],[s_psi2,s_b2]) - [kappa,0]]
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from optimization_dynamics_tpu.models.base import variational_dynamics
from optimization_dynamics_tpu.ops.cones import ConeSpec, cone_product

NQ, NU, NC = 2, 1, 2
NZ_FRICTION = NQ + 4 * NC        # 10
NZ_FRICTIONLESS = NQ             # 2
NTHETA_FRICTION = 2 * NQ + NU + 2 + 1   # 8
NTHETA_FRICTIONLESS = 2 * NQ + NU + 1   # 6


class CartpoleParams(NamedTuple):
    mc: float = 1.0    # cart mass
    mp: float = 0.2    # pole point mass
    length: float = 0.5
    gravity: float = 9.81


def kinematics(p: CartpoleParams, q):
    return jnp.array([q[0] + p.length * jnp.sin(q[1]),
                      -p.length * jnp.cos(q[1])])


def mass_matrix(p: CartpoleParams, q):
    a = p.mc + p.mp
    b = p.mp * p.length * jnp.cos(q[1])
    c = p.mp * p.length ** 2
    return jnp.array([[a, b], [b, c]])


def dynamics_bias(p: CartpoleParams, q, v):
    """-C v + G convention of the reference (model.jl:43-49), returned with
    the sign expected by ``variational_dynamics`` (D1L = -bias)."""
    c_times_v = jnp.array(
        [-p.mp * v[1] * p.length * jnp.sin(q[1]) * v[1], 0.0])
    g = jnp.array([0.0, p.mp * p.gravity * p.length * jnp.sin(q[1])])
    return -c_times_v + g


def control_force(u):
    return jnp.array([u[0], 0.0])


def unpack_theta_friction(theta):
    q0 = theta[0:2]
    q1 = theta[2:4]
    u = theta[4:5]
    mu_slider = theta[5]
    mu_angle = theta[6]
    h = theta[7]
    return q0, q1, u, mu_slider, mu_angle, h


def pack_theta_friction(q0, q1, u, friction, h):
    return jnp.concatenate(
        [q0, q1, u, jnp.asarray(friction).reshape(2), jnp.atleast_1d(h)])


def pack_theta_frictionless(q0, q1, u, h):
    return jnp.concatenate([q0, q1, u, jnp.atleast_1d(h)])


def residual_friction(p: CartpoleParams, z, theta, kappa):
    q0, q1, u, mu_slider, mu_angle, h = unpack_theta_friction(theta)
    q2 = z[0:2]
    psi = z[2:4]
    b = z[4:6]
    s_psi = z[6:8]
    s_b = z[8:10]

    vT = (q2 - q1) / h     # joint slip velocities (P = I, model.jl:38-41)

    d = variational_dynamics(
        lambda q: mass_matrix(p, q),
        lambda q, v: dynamics_bias(p, q, v),
        h, q0, q1, q2,
        control_force(u),
        contact_force=b,   # P^T b with P = I
    )
    kvec = jnp.stack([kappa * jnp.ones(()), jnp.zeros(())])
    return jnp.concatenate([
        d,
        jnp.array([
            s_b[0] - vT[0],
            psi[0] - mu_slider * (p.mp + p.mc) * p.gravity * h,
            s_b[1] - vT[1],
            psi[1] - mu_angle * (p.mp * p.gravity * p.length) * h,
        ]),
        cone_product(jnp.array([psi[0], b[0]]),
                     jnp.array([s_psi[0], s_b[0]])) - kvec,
        cone_product(jnp.array([psi[1], b[1]]),
                     jnp.array([s_psi[1], s_b[1]])) - kvec,
    ])


def residual_frictionless(p: CartpoleParams, z, theta, kappa):
    q0 = theta[0:2]
    q1 = theta[2:4]
    u = theta[4:5]
    h = theta[5]
    q2 = z[0:2]
    return variational_dynamics(
        lambda q: mass_matrix(p, q),
        lambda q, v: dynamics_bias(p, q, v),
        h, q0, q1, q2,
        control_force(u),
    )


def cone_spec_friction() -> ConeSpec:
    """Two 2-dim SOC pairs (simulator_friction.jl:18-34)."""
    return ConeSpec(
        nz=NZ_FRICTION,
        ntheta=NTHETA_FRICTION,
        eq_rows=(0, 1, 2, 3, 4, 5),
        soc_prim=((2, 4), (3, 5)),
        soc_dual=((6, 8), (7, 9)),
        soc_rows=((6, 7), (8, 9)),
    )


def cone_spec_frictionless() -> ConeSpec:
    return ConeSpec(nz=NZ_FRICTIONLESS, ntheta=NTHETA_FRICTIONLESS,
                    eq_rows=(0, 1))


def init_z_friction(q):
    """z = [q; psi=1; b=0.1; s_psi=1; s_b=0.1]
    (simulator_friction.jl:36-42)."""
    tail = jnp.array([1.0, 1.0, 0.1, 0.1, 1.0, 1.0, 0.1, 0.1], q.dtype)
    return jnp.concatenate([q, tail])


def init_z_frictionless(q):
    return q


class CartpoleAux(NamedTuple):
    """Scenario parameters: timestep and the two friction coefficients
    (part of theta, so friction sweeps vmap/shard)."""
    h: float
    friction: jnp.ndarray = None  # (2,)


def friction_model(params: CartpoleParams = CartpoleParams()):
    from optimization_dynamics_tpu.dynamics import ImplicitModel

    def residual(z, theta, kappa):
        return residual_friction(params, z, theta, kappa)

    def theta_fn(q0, q1, u, aux: CartpoleAux):
        return pack_theta_friction(q0, q1, u, aux.friction,
                                   jnp.asarray(aux.h, q0.dtype))

    return ImplicitModel(
        nq=NQ, nu=NU, nz=NZ_FRICTION, ntheta=NTHETA_FRICTION,
        residual=residual,
        spec=cone_spec_friction(),
        init_z=init_z_friction,
        theta_fn=theta_fn,
        q_sel=(0, 1),
        th_q0=(0, 1), th_q1=(2, 3), th_u=(4,),
    )


def frictionless_model(params: CartpoleParams = CartpoleParams()):
    from optimization_dynamics_tpu.dynamics import ImplicitModel

    def residual(z, theta, kappa):
        return residual_frictionless(params, z, theta, kappa)

    def theta_fn(q0, q1, u, aux: CartpoleAux):
        return pack_theta_frictionless(q0, q1, u,
                                       jnp.asarray(aux.h, q0.dtype))

    return ImplicitModel(
        nq=NQ, nu=NU, nz=NZ_FRICTIONLESS, ntheta=NTHETA_FRICTIONLESS,
        residual=residual,
        spec=cone_spec_frictionless(),
        init_z=init_z_frictionless,
        theta_fn=theta_fn,
        q_sel=(0, 1),
        th_q0=(0, 1), th_q1=(2, 3), th_u=(4,),
    )
