"""Comparison-oracle capabilities: direct transcription and MuJoCo+FD."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_hopper_direct_transcription_hops():
    from optimization_dynamics_tpu.examples.comparisons import hopper_direct
    prob, w0, opts = hopper_direct.build_problem()
    from optimization_dynamics_tpu.solver.direct import solve_direct
    res = jax.jit(lambda w: solve_direct(prob, w, opts))(w0)
    assert bool(res.converged)
    w = np.asarray(res.w).reshape(hopper_direct.T - 1,
                                  hopper_direct.NW_STAGE)
    assert w[-1, 0] >= 0.5 - 1e-2            # travel
    assert np.sum(w[:, 20]) < 1e-2           # complementarity slack


def test_mujoco_fd_wiring():
    """MuJoCo stepping + FD Jacobians flow through the jitted solver."""
    mujoco = pytest.importorskip("mujoco")
    del mujoco
    from optimization_dynamics_tpu.examples.comparisons import (
        acrobot_mujoco as cm,
    )
    from optimization_dynamics_tpu.solver.ilqr import ILQROptions, solve

    sim = cm.MuJoCoAcrobot()
    x = jnp.zeros(4)
    u = jnp.array([1.0])
    y = sim.step(x, u)
    assert y.shape == (4,)
    y2, fx, fu = sim.step_jac(x, u)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-12)
    assert bool(jnp.all(jnp.isfinite(fx)))

    prob, x0, us0, opts = cm.build_problem(T=6)
    opts = ILQROptions(max_iter=2, max_al_iter=2, con_tol=1e-2)
    res = solve(prob, x0, us0[:5], opts)
    assert bool(jnp.all(jnp.isfinite(res.xs)))
