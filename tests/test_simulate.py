"""Simulator-style rollout with contact-force trajectories."""

import jax
import jax.numpy as jnp
import numpy as np

from optimization_dynamics_tpu.dynamics import (
    make_implicit_dynamics,
    simulate,
)
from optimization_dynamics_tpu.models import acrobot


def test_simulate_collects_solver_variables():
    dyn = make_implicit_dynamics(acrobot.impact_model())
    aux = acrobot.AcrobotAux(h=0.05)
    x0 = jnp.array([0.0, 1.4, 0.0, 1.45])
    us = jnp.full((12, 1), 3.0)
    xs, sols = jax.jit(lambda x, u: simulate(dyn, x, u, aux))(x0, us)
    assert xs.shape == (13, 4)
    assert sols.z.shape == (12, acrobot.NZ_IMPACT)
    assert bool(jnp.all(sols.converged))
    # once the elbow limit engages, the limit impulse is positive
    lam = sols.z[:, 2:4]
    assert float(jnp.max(lam)) > 1e-3
    # the slacks track the signed distance
    s = np.asarray(sols.z[:, 4:6])
    phi = np.stack([np.asarray(acrobot.signed_distance(x[2:]))
                    for x in np.asarray(xs[1:])])
    np.testing.assert_allclose(s, phi, atol=1e-3)
