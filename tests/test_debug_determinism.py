"""Debug checks + determinism tests (SURVEY.md §5; VERDICT r1 coverage
gap: "no jax_debug_nans harness, no determinism tests").

Determinism matters because converged trajectories are regression
goldens (tests/goldens.json): a nondeterministic kernel would make the
goldens flaky. XLA CPU/TPU are deterministic for this op set; these
tests pin that property end-to-end through the solver stack.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimization_dynamics_tpu.dynamics import make_implicit_dynamics
from optimization_dynamics_tpu.models import acrobot, cartpole
from optimization_dynamics_tpu.utils.debug import (assert_finite,
                                                   check_finite,
                                                   nan_guard)


def _impact_dyn():
    return make_implicit_dynamics(acrobot.impact_model()), \
        acrobot.AcrobotAux(h=0.05)


def test_nan_guard_raises_at_source():
    with pytest.raises(FloatingPointError):
        with nan_guard():
            jnp.log(jnp.zeros(3) - 1.0).block_until_ready()
    # restored afterwards
    assert not jax.config.jax_debug_nans
    y = jnp.log(jnp.zeros(3) - 1.0)
    assert bool(jnp.all(jnp.isnan(y)))


def test_check_finite_per_lane():
    tree = {
        "xs": jnp.array([[1.0, 2.0], [jnp.nan, 0.0], [3.0, 4.0]]),
        "obj": jnp.array([1.0, 2.0, jnp.inf]),
        "its": jnp.array([1, 2, 3]),        # int leaf ignored
    }
    ok = np.asarray(check_finite(tree))
    assert ok.tolist() == [True, False, False]


def test_assert_finite_names_fields():
    with pytest.raises(FloatingPointError, match="bad"):
        assert_finite({"good": jnp.ones(2),
                       "bad": jnp.array([jnp.nan])})


def test_implicit_step_deterministic():
    """Same inputs -> bit-identical outputs across repeated jit calls."""
    dyn, aux = _impact_dyn()
    x = jnp.array([0.1, -0.3, 0.15, -0.25])
    u = jnp.array([0.7])
    f = jax.jit(lambda x, u: dyn.step_jac(x, u, aux))
    y1, fx1, fu1 = f(x, u)
    y2, fx2, fu2 = f(x, u)
    assert np.array_equal(np.asarray(y1), np.asarray(y2))
    assert np.array_equal(np.asarray(fx1), np.asarray(fx2))
    assert np.array_equal(np.asarray(fu1), np.asarray(fu2))


def test_batched_solve_deterministic():
    """Full batched contact solve: two runs, bit-identical pytrees."""
    from optimization_dynamics_tpu.solver.ilqr import (ILQROptions,
                                                       ILQRProblem)
    from optimization_dynamics_tpu.solver.ilqr_batched import solve_batched
    dyn, aux = _impact_dyn()
    T = 6
    goal = jnp.array([0.2, 1.2, 0.2, 1.2])
    prob = ILQRProblem(
        T=T, nx=4, nu=1, ncon=0, nconT=4,
        dynamics=lambda t, x, u: dyn.step(x, u, aux),
        dynamics_jac=lambda t, x, u: dyn.step_jac(x, u, aux),
        dynamics_jac_batched=lambda ts, xs, us: dyn.step_jac_batched(
            xs, us, aux),
        dynamics_batched=lambda t, xs, us: dyn.step_batched(xs, us, aux),
        stage_cost=lambda t, x, u: 0.5 * jnp.sum(u * u),
        terminal_cost=lambda x: 5.0 * jnp.sum((x - goal) ** 2),
        terminal_con=lambda x: x - goal)
    opts = ILQROptions(max_iter=6, max_al_iter=2, con_tol=1e-2)
    B = 3
    x0s = jnp.tile(jnp.array([0.1, 1.0, 0.1, 1.0]), (B, 1)) \
        + 0.05 * jax.random.normal(jax.random.PRNGKey(0), (B, 4))
    us0 = jnp.zeros((T - 1, 1))
    run = jax.jit(lambda xs: solve_batched(prob, xs, us0, opts))
    r1 = run(x0s)
    r2 = run(x0s)
    for a, b in zip(jax.tree_util.tree_leaves(r1),
                    jax.tree_util.tree_leaves(r2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert bool(np.all(np.asarray(check_finite(r1))))
