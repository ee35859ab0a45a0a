"""Fused Pallas IP kernel vs the batched-native solver (interpret mode).

The kernel must reproduce make_solver_batched exactly (same schedule,
same line-search pick): identical iteration counts and f32-roundoff-equal
solutions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimization_dynamics_tpu.models import acrobot, cartpole
from optimization_dynamics_tpu.ops.pallas.fused_ip import (
    make_fused_ip_solver,
)
from optimization_dynamics_tpu.solver.interior_point import (
    IPOptions,
    make_solver_batched,
)

OPTS = IPOptions(r_tol=3e-5, kappa_tol=1e-3, max_iter=40, max_ls=8,
                 kappa_init_min=1e-2)


def _batch(model, aux, B=16, seed=0):
    nq = model.nq
    q0 = 0.2 * jax.random.normal(jax.random.PRNGKey(seed), (B, nq),
                                 jnp.float32)
    q1 = q0 + 0.02 * jax.random.normal(jax.random.PRNGKey(seed + 1),
                                       (B, nq), jnp.float32)
    u = 0.5 * jax.random.normal(jax.random.PRNGKey(seed + 2),
                                (B, model.nu), jnp.float32)
    thetas = jax.vmap(lambda a, b, c: model.theta_fn(a, b, c, aux))(
        q0, q1, u)
    z0s = jax.vmap(model.init_z)(q1)
    return z0s, thetas


@pytest.mark.parametrize("name", ["cartpole", "acrobot"])
def test_fused_matches_batched(name):
    if name == "cartpole":
        model = cartpole.friction_model()
        aux = cartpole.CartpoleAux(
            h=0.05, friction=jnp.asarray([0.35, 0.35], jnp.float32))
    else:
        model = acrobot.impact_model()
        aux = acrobot.AcrobotAux(h=jnp.float32(0.05))
    z0s, thetas = _batch(model, aux)
    # reference in f64 (the batched solver promotes under the x64 test
    # config); the fused kernel is f32 by design -> tolerance compare
    ref = make_solver_batched(model.residual, model.spec, OPTS)(
        z0s.astype(jnp.float64), thetas.astype(jnp.float64))
    fus = make_fused_ip_solver(model.residual, model.spec, OPTS,
                               interpret=True)(z0s, thetas)
    assert int(jnp.sum(fus.converged)) == int(jnp.sum(ref.converged))
    both = np.asarray(ref.converged) & np.asarray(fus.converged)
    nq = model.nq
    np.testing.assert_allclose(np.asarray(fus.z)[both][:, :nq],
                               np.asarray(ref.z)[both][:, :nq], atol=1e-4)


def test_fused_pads_ragged_batch():
    model = acrobot.impact_model()
    aux = acrobot.AcrobotAux(h=jnp.float32(0.05))
    z0s, thetas = _batch(model, aux, B=5)
    sol = make_fused_ip_solver(model.residual, model.spec, OPTS,
                               interpret=True)(z0s, thetas)
    assert sol.z.shape == (5, model.nz)
    assert bool(jnp.all(sol.converged))
