"""Planar pushing: a box slider driven by a point pusher.

TPU-native re-implementation of
/root/reference/src/models/planar_push/model.jl — the richest cone
structure in the suite (simulator.jl:16-50): one impact complementarity
(pusher-box), four 2-dim surface-friction cones (one per box corner,
bounded by the quarter-weight friction budget) and one 1-dim pusher
friction cone (bounded by mu_pusher * impact force).

Variable layout (simulator.jl:1-12), 0-based:
    z = [q2 (0:5), gamma1 (5), s1 (6), psi (7:12), b (12:21),
         s_psi (21:26), s_b (26:35)]                     nz = 35
Problem data: theta = [q0 (5), q1 (5), u (2), h (1)]    ntheta = 13
Residual rows (model.jl:121-187):
    [dynamics (0:5); s1 - phi (5); psi_1..4 - mu m g h/4 (6:10);
     psi5 - mu_pusher*gamma1 (10); vT - s_b (11:20);
     gamma1*s1 - kappa (20); 4x cone3 (21:33); cone2 (33:35)]
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from optimization_dynamics_tpu.ops.cones import ConeSpec, cone_product

NQ, NU, NC = 5, 2, 5
NB = 9                      # 4 corners x 2 + pusher x 1
NZ = NQ + 2 + 2 * (NC + NB)  # 35
NTHETA = 2 * NQ + NU + 1     # 13

R_DIM = 0.1
_CORNERS = ((R_DIM, R_DIM), (-R_DIM, R_DIM),
            (R_DIM, -R_DIM), (-R_DIM, -R_DIM))


class PlanarPushParams(NamedTuple):
    mass_block: float = 1.0
    mass_pusher: float = 10.0
    inertia: float = 1.0 / 12.0 * 1.0 * (2 * R_DIM) ** 2 * 2
    mu_surface: float = 0.5
    mu_pusher: float = 0.5
    gravity: float = 9.81


def _rotate2(angle, v):
    """2-D rotation as scalar arithmetic — NOT a 2x2 matmul: inside the
    fused Pallas kernel the batched tiny dot_general hits a Mosaic
    dot_dimension_numbers serialization bug on this toolchain
    (logs/push_fail_trace.log); elementwise trig lowers cleanly and is
    faster anyway."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack([c * v[0] - s * v[1], s * v[0] + c * v[1]])


def sd_2d_box(p, pose):
    """p=10 smooth-max signed distance to the box (model.jl:26-31)."""
    delta = _rotate2(-pose[2], p - pose[0:2])
    s = 10
    return jnp.sum(delta ** s) ** (1.0 / s) - R_DIM


def phi(q):
    """Pusher-box signed distance (model.jl:65-72)."""
    return sd_2d_box(q[3:5], q[0:3])


def corner_positions(q):
    """World positions of the four contact corners (model.jl:87-96)."""
    pos = q[0:2]
    return jnp.concatenate(
        [pos + _rotate2(q[2], jnp.array(c)) for c in _CORNERS])


def normal(q):
    return jax.grad(phi)(q)


def tangential_jacobian(q):
    """P (9 x 5): corner-velocity rows + pusher tangential row with its
    torsional moment arm (model.jl:98-119)."""
    p_block = jax.jacfwd(corner_positions)(q)   # (8, 5)
    n = normal(q)
    n_pusher = n[3:5]
    n_dir = n_pusher / jnp.sqrt(n_pusher[0] ** 2 + n_pusher[1] ** 2)
    t_dir = jnp.array([-n_dir[1], n_dir[0]])
    r = q[3:5] - q[0:2]
    m = r[0] * t_dir[1] - r[1] * t_dir[0]
    p_pusher = jnp.array([t_dir[0], t_dir[1], m, -t_dir[0], -t_dir[1]])
    return jnp.concatenate([p_block, p_pusher[None, :]], axis=0)


def mass_diag(p: PlanarPushParams):
    """Diagonal of the (diagonal) mass matrix — applied elementwise."""
    return jnp.stack([jnp.asarray(p.mass_block), jnp.asarray(p.mass_block),
                      jnp.asarray(p.inertia), jnp.asarray(p.mass_pusher),
                      jnp.asarray(p.mass_pusher)])


def mass_matrix(p: PlanarPushParams):
    return jnp.diag(mass_diag(p))


def control_matrix():
    B = np.zeros((NQ, NU))
    B[3, 0] = 1.0
    B[4, 1] = 1.0
    return jnp.asarray(B)


def _matvec(A, x):
    """A @ x as multiply + reduce. The batched tiny dot_generals that
    ``vmap``-to-batch-last produces inside the fused Pallas kernel hit
    Mosaic toolchain bugs on these shapes (unparseable
    tpu.dot_dimension_numbers for 2x2, rejected batched tpu.matmul for
    9x5 — logs/push_fail_trace.log, logs/bench_r4_push_run2.log);
    elementwise forms lower cleanly and cost the same on the VPU."""
    return jnp.sum(A * x[None, :], axis=1)


def unpack_z(z):
    q2 = z[0:5]
    gamma1 = z[5]
    s1 = z[6]
    psi = z[7:12]
    b = z[12:21]
    s_psi = z[21:26]
    s_b = z[26:35]
    return q2, gamma1, s1, psi, b, s_psi, s_b


def pack_theta(q0, q1, u, h):
    return jnp.concatenate([q0, q1, u, jnp.atleast_1d(h)])


def residual(p: PlanarPushParams, z, theta, kappa):
    q0 = theta[0:5]
    q1 = theta[5:10]
    u = theta[10:12]
    h = theta[12]
    q2, gamma1, s1, psi, b, s_psi, s_b = unpack_z(z)

    m_diag = mass_diag(p)
    P = tangential_jacobian(q2)
    N = normal(q2)
    vT = _matvec(P, q2 - q1) / h

    vm1 = (q1 - q0) / h
    vm2 = (q2 - q1) / h
    # D1L = 0 (no potential in-plane), D2L = M v (model.jl:150-161);
    # M is diagonal and B a selection, so both apply elementwise (and
    # the kernel path needs the dot-free forms — see _matvec)
    d = (m_diag * (vm1 - vm2)
         + jnp.concatenate([jnp.zeros(3, u.dtype), u])
         + N * gamma1
         + jnp.sum(P * b[:, None], axis=0))

    budget = p.mu_surface * p.mass_block * p.gravity * h * 0.25
    k3 = jnp.stack([jnp.asarray(kappa) * jnp.ones(()), jnp.zeros(()),
                    jnp.zeros(())])
    k2 = k3[:2]

    cones = []
    for i in range(4):
        cones.append(cone_product(
            jnp.concatenate([psi[i:i + 1], b[2 * i:2 * i + 2]]),
            jnp.concatenate([s_psi[i:i + 1], s_b[2 * i:2 * i + 2]])) - k3)
    cones.append(cone_product(
        jnp.stack([psi[4], b[8]]), jnp.stack([s_psi[4], s_b[8]])) - k2)

    return jnp.concatenate([
        d,
        jnp.array([s1 - phi(q2)]),
        psi[0:4] - budget,
        jnp.array([psi[4] - p.mu_pusher * gamma1]),
        vT - s_b,
        jnp.array([gamma1 * s1 - kappa]),
        *cones,
    ])


def cone_spec() -> ConeSpec:
    """simulator.jl:16-50 translated to 0-based indices."""
    soc_prim = tuple(
        [(7 + i, 12 + 2 * i, 13 + 2 * i) for i in range(4)] + [(11, 20)])
    soc_dual = tuple(
        [(21 + i, 26 + 2 * i, 27 + 2 * i) for i in range(4)] + [(25, 34)])
    soc_rows = tuple(
        [(21 + 3 * i, 22 + 3 * i, 23 + 3 * i) for i in range(4)]
        + [(33, 34)])
    return ConeSpec(
        nz=NZ, ntheta=NTHETA,
        eq_rows=tuple(range(20)),
        ort_prim=(5,), ort_dual=(6,), ort_rows=(20,),
        soc_prim=soc_prim, soc_dual=soc_dual, soc_rows=soc_rows,
    )


def init_z(q):
    """simulator.jl:52-60: gamma,s,psi,s_psi = 1; b,s_b = 0.1."""
    z = jnp.concatenate([
        q,
        jnp.ones(2, q.dtype),               # gamma1, s1
        jnp.ones(5, q.dtype),               # psi
        jnp.full((9,), 0.1, q.dtype),       # b
        jnp.ones(5, q.dtype),               # s_psi
        jnp.full((9,), 0.1, q.dtype),       # s_b
    ])
    return z


class PlanarPushAux(NamedTuple):
    h: float


def model(params: PlanarPushParams = PlanarPushParams()):
    from optimization_dynamics_tpu.dynamics import ImplicitModel

    def res(z, theta, kappa):
        return residual(params, z, theta, kappa)

    def theta_fn(q0, q1, u, aux: PlanarPushAux):
        return pack_theta(q0, q1, u, jnp.asarray(aux.h, q0.dtype))

    return ImplicitModel(
        nq=NQ, nu=NU, nz=NZ, ntheta=NTHETA,
        residual=res,
        spec=cone_spec(),
        init_z=init_z,
        theta_fn=theta_fn,
        q_sel=tuple(range(NQ)),
        th_q0=tuple(range(5)), th_q1=tuple(range(5, 10)),
        th_u=(10, 11),
    )
