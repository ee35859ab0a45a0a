"""Shared model-layer helpers.

Each model module provides, TPU-style (pure functions + pytree params):

  * ``Params`` — a NamedTuple of physical parameters (a pytree, so whole
    parameter sweeps can be vmapped/sharded over a device mesh);
  * ``residual(params, z, theta, kappa)`` — the optimization-based dynamics
    residual, a pure JAX function (replaces the reference's Symbolics
    codegen, /root/reference/src/models/*/codegen.jl — Jacobians come from
    ``jax.jacfwd`` at trace time);
  * ``cone_spec()`` — the static cone/index bundle;
  * ``init_z(params, q)`` — strictly-interior warm start
    (mirrors ``RoboDojo.initialize_z!``);
  * ``pack_theta(...)`` — the problem-data layout (mirrors
    ``RoboDojo.initialize_theta!`` / ``indices_theta``).

The integrator below is the midpoint variational integrator used by every
contact model in the reference (e.g.
/root/reference/src/models/cartpole/model.jl:51-64).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["variational_dynamics", "rotation_matrix"]


def variational_dynamics(mass_matrix, dynamics_bias, h, q0, q1, q2, control,
                         contact_force=None, damping=0.0):
    """Midpoint variational integrator residual rows.

    ``mass_matrix(q)`` and ``dynamics_bias(q, v)`` define the smooth
    mechanics; ``control`` is the generalized control force evaluated at the
    second midpoint; ``contact_force`` is ``P(q2)^T lambda`` (already mapped
    to generalized coordinates); ``damping`` adds ``-h/2 * damping * vm2``
    (the acrobot's viscous term, /root/reference/src/models/acrobot/model.jl:103).

    D1L(q, v) = -dynamics_bias(q, v); D2L(q, v) = M(q) v.
    Residual: ``0.5 h D1L1 + D2L1 + 0.5 h D1L2 - D2L2 + control [+ contact]``.
    """
    qm1 = 0.5 * (q0 + q1)
    vm1 = (q1 - q0) / h
    qm2 = 0.5 * (q1 + q2)
    vm2 = (q2 - q1) / h

    # matvec as multiply-reduce: identical math, but lowers to elementwise
    # ops + a reduction instead of dot_general — required for tracing the
    # residual inside Pallas kernels (Mosaic cannot lower the
    # vmap(jvp(matmul)) dot_general/reshape chain for these tiny systems)
    mv = lambda A, v: jnp.sum(A * v[None, :], axis=1)

    d1l1 = -dynamics_bias(qm1, vm1)
    d2l1 = mv(mass_matrix(qm1), vm1)
    d1l2 = -dynamics_bias(qm2, vm2)
    d2l2 = mv(mass_matrix(qm2), vm2)

    d = 0.5 * h * d1l1 + d2l1 + 0.5 * h * d1l2 - d2l2 + control
    if contact_force is not None:
        d = d + contact_force
    if damping != 0.0:
        d = d - h * damping * vm2
    return d


def rotation_matrix(angle):
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    return jnp.array([[c, -s], [s, c]])
