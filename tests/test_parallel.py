"""Scenario sharding across the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from optimization_dynamics_tpu.dynamics import make_implicit_dynamics
from optimization_dynamics_tpu.models import acrobot
from optimization_dynamics_tpu.parallel.mesh import (
    scenario_mesh,
    shard_scenarios,
    sharded_map,
)
from optimization_dynamics_tpu.solver.ilqr import (
    ILQROptions,
    ILQRProblem,
    solve,
)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_step_matches_unsharded():
    dyn = make_implicit_dynamics(acrobot.impact_model())
    aux = acrobot.AcrobotAux(h=0.05)
    step = lambda x, u: dyn.step(x, u, aux)

    B = 16
    key = jax.random.PRNGKey(0)
    xs = 0.3 * jax.random.normal(key, (B, 4))
    us = 0.1 * jax.random.normal(key, (B, 1))

    mesh = scenario_mesh()
    run = sharded_map(step, mesh)
    ys_sharded = run(xs, us)
    ys_local = jax.vmap(step)(xs, us)
    np.testing.assert_allclose(np.asarray(ys_sharded),
                               np.asarray(ys_local), atol=1e-12)
    # actually sharded across all 8 devices
    assert len(ys_sharded.sharding.device_set) == 8


def test_sharded_full_ilqr_solve():
    """A whole (tiny) constrained iLQR solve sharded over the mesh."""
    T = 8
    A = jnp.array([[1.0, 0.1], [0.0, 1.0]])
    Bm = jnp.array([[0.005], [0.1]])

    def solve_one(goal):
        prob = ILQRProblem(
            T=T, nx=2, nu=1, ncon=0, nconT=2,
            dynamics=lambda t, x, u: A @ x + Bm @ u,
            dynamics_jac=lambda t, x, u: (A @ x + Bm @ u, A, Bm),
            stage_cost=lambda t, x, u: 0.5 * jnp.sum(u * u),
            terminal_cost=lambda x: 0.0,
            terminal_con=lambda x: x - goal,
        )
        return solve(prob, jnp.zeros(2), jnp.zeros((T - 1, 1)),
                     ILQROptions(con_tol=1e-4))

    B = 8
    goals = jnp.stack([jnp.array([0.1 * (i + 1), 0.0]) for i in range(B)])
    mesh = scenario_mesh()
    goals = shard_scenarios(mesh, goals)
    res = jax.jit(jax.vmap(solve_one))(goals)
    assert bool(jnp.all(res.converged))
    np.testing.assert_allclose(np.asarray(res.xs[:, -1]),
                               np.asarray(goals), atol=1e-3)


def test_convergence_summary():
    from optimization_dynamics_tpu.parallel.mesh import convergence_summary
    conv = jnp.array([True, False, True, True])
    iters = jnp.array([10, 50, 12, 8])
    s = convergence_summary(conv, iters)
    assert s["n_scenarios"] == 4
    assert s["n_converged"] == 3
    assert abs(s["fraction_converged"] - 0.75) < 1e-6
    assert s["max_iterations"] == 50
    assert s["failed_indices"] == [1]


def test_quarantine():
    from optimization_dynamics_tpu.parallel.mesh import quarantine
    conv = jnp.array([True, False, True, False])
    assert quarantine(conv) == [1, 3]
    assert quarantine(jnp.array([True, True])) == []


def test_merge_retry():
    from typing import NamedTuple

    from optimization_dynamics_tpu.parallel.mesh import merge_retry

    class R(NamedTuple):
        xs: jnp.ndarray
        converged: jnp.ndarray

    res = R(xs=jnp.array([[1.0, 1.0], [2.0, 2.0], [3.0, 3.0]]),
            converged=jnp.array([True, False, False]))
    retry = R(xs=jnp.array([[9.0, 9.0], [8.0, 8.0], [7.0, 7.0]]),
              converged=jnp.array([True, True, False]))
    out = merge_retry(res, retry)
    # lane 0: original kept; lane 1: retry taken; lane 2: both failed ->
    # original kept
    np.testing.assert_allclose(np.asarray(out.xs),
                               [[1.0, 1.0], [8.0, 8.0], [3.0, 3.0]])
    assert list(np.asarray(out.converged)) == [True, True, False]
