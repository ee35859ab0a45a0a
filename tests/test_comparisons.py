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


def test_mujoco_fd_jacobians_match_native_fd():
    """Oracle check: our central-difference Jacobians must match MuJoCo's
    own ``mjd_transitionFD`` derivatives (the comparison's gradient path
    is only meaningful if the FD oracle itself is right)."""
    mujoco = pytest.importorskip("mujoco")
    from optimization_dynamics_tpu.examples.comparisons import (
        acrobot_mujoco as cm,
    )

    sim = cm.MuJoCoAcrobot()
    rng = np.random.default_rng(0)
    for _ in range(3):
        x = 0.5 * rng.standard_normal(4)
        u = rng.standard_normal(1)
        _, fx, fu = sim._jac_np(x.copy(), u.copy())

        d = sim.data
        d.qpos[:] = x[:2]
        d.qvel[:] = x[2:]
        d.ctrl[:] = u
        A = np.zeros((4, 4))
        Bm = np.zeros((4, 1))
        mujoco.mjd_transitionFD(sim.model, d, 1e-6, 1,  # centred
                                A, Bm, None, None)
        np.testing.assert_allclose(fx, A, atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(fu, Bm, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_mujoco_study_artifact_matches_module():
    """The committed study artifact (docs/mujoco_study.json) must match
    the recorded outcome shape: the MuJoCo+FD path is demonstrably stuck
    (non-converged, elbow limit transiently violated) — the reference's
    comparison argument (acrobot.jl:93-102)."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "mujoco_study.json")
    with open(path) as f:
        art = json.load(f)
    assert art["converged"] is False
    assert art["constraint_violation"] > 10 * art["con_tol"]
    assert art["max_abs_elbow"] > art["elbow_hard_limit"]
    assert art["al_iterations"] == 20
