"""End-to-end: acrobot swing-up through optimization-based dynamics.

Reproduces /root/reference/examples/acrobot.jl behavior: converged swing-up
to x = [pi, 0, pi, 0] with terminal violation < con_tol and the elbow
joint limit |q2| <= pi/2 respected along the whole trajectory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimization_dynamics_tpu.examples import acrobot as ex
from optimization_dynamics_tpu.solver.ilqr import solve


@pytest.mark.parametrize("mode", ["nominal", "impact"])
def test_swingup_converges(mode):
    prob, x0, us_init, opts = ex.build_problem(mode)
    res = jax.jit(lambda x, u: solve(prob, x, u, opts))(x0, us_init)
    assert bool(res.converged)
    vio = float(res.constraint_violation)
    assert vio < opts.con_tol
    xT = np.array([np.pi, 0.0, np.pi, 0.0])
    np.testing.assert_allclose(np.asarray(res.xs[-1]), xT, atol=2e-3)
    if mode == "impact":
        # elbow never exceeds the joint limit
        assert float(jnp.max(jnp.abs(res.xs[:, 3]))) <= np.pi / 2 + 1e-4
        assert float(jnp.max(jnp.abs(res.xs[:, 1]))) <= np.pi + 1e-4
