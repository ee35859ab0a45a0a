"""Interior-point solver unit tests on analytic problems."""

import jax
import jax.numpy as jnp
import numpy as np

from optimization_dynamics_tpu.ops.cones import ConeSpec, cone_product
from optimization_dynamics_tpu.solver.interior_point import (
    IPOptions,
    make_sensitivity,
    make_solver,
)


def _nn_lsq_residual(z, theta, kappa):
    """KKT of min 0.5||x - theta||^2 s.t. x >= 0 (n=2).

    z = [x (2), lam (2), s (2)]; rows: x - theta - lam; s - x; lam.*s - kappa.
    Solution: x = max(theta, 0).
    """
    x = z[0:2]
    lam = z[2:4]
    s = z[4:6]
    return jnp.concatenate([
        x - theta - lam,
        s - x,
        lam * s - kappa,
    ])


_NN_SPEC = ConeSpec(
    nz=6, ntheta=2,
    eq_rows=(0, 1, 2, 3),
    ort_prim=(2, 3), ort_dual=(4, 5), ort_rows=(4, 5),
)


def test_nonnegative_projection():
    opts = IPOptions(r_tol=1e-10, kappa_tol=1e-8)
    solve = jax.jit(make_solver(_nn_lsq_residual, _NN_SPEC, opts))
    theta = jnp.array([0.7, -1.3])
    z0 = jnp.array([0.0, 0.0, 1.0, 1.0, 1.0, 1.0])
    sol = solve(z0, theta)
    assert bool(sol.converged)
    np.testing.assert_allclose(sol.z[0:2], [0.7, 0.0], atol=1e-4)


def test_nonnegative_projection_sensitivity():
    """IFT gradient of the relaxed problem ~ finite differences."""
    opts = IPOptions(r_tol=1e-10, kappa_tol=1e-3)
    solve = jax.jit(make_solver(_nn_lsq_residual, _NN_SPEC, opts))
    sens = jax.jit(make_sensitivity(_nn_lsq_residual, _NN_SPEC))

    theta = jnp.array([0.5, -0.2])
    z0 = jnp.array([0.0, 0.0, 1.0, 1.0, 1.0, 1.0])
    sol = solve(z0, theta)
    assert bool(sol.converged)
    dz = sens(sol.z, theta)

    eps = 1e-6
    for j in range(2):
        tp = theta.at[j].add(eps)
        tm = theta.at[j].add(-eps)
        # warm-start FD solves from the base solution for stability
        zp = solve(sol.z, tp).z
        zm = solve(sol.z, tm).z
        fd = (zp - zm) / (2 * eps)
        np.testing.assert_allclose(dz[:, j], fd, atol=1e-4)


def _soc_proj_residual(z, theta, kappa):
    """KKT of min 0.5||x - theta||^2 s.t. x in SOC(3).

    z = [x (3), v (3)]; rows: x - theta - v; x o v - kappa e.
    """
    x = z[0:3]
    v = z[3:6]
    e = jnp.array([1.0, 0.0, 0.0], z.dtype)
    return jnp.concatenate([
        x - theta - v,
        cone_product(x, v) - kappa * e,
    ])


_SOC_SPEC = ConeSpec(
    nz=6, ntheta=3,
    eq_rows=(0, 1, 2),
    soc_prim=((0, 1, 2),), soc_dual=((3, 4, 5),), soc_rows=((3, 4, 5),),
)


def _soc_project(y):
    """Analytic projection onto the second-order cone (axis-first)."""
    y0, y1 = y[0], y[1:]
    n = np.linalg.norm(y1)
    if n <= y0:
        return y
    if n <= -y0:
        return np.zeros_like(y)
    a = 0.5 * (1.0 + y0 / n)
    out = np.concatenate([[a * n], a * y1])
    return out


def test_soc_projection_matches_analytic():
    opts = IPOptions(r_tol=1e-10, kappa_tol=1e-8)
    solve = jax.jit(make_solver(_soc_proj_residual, _SOC_SPEC, opts))
    for target in ([0.1, 1.0, -0.5], [2.0, 0.3, 0.1], [-2.0, 0.1, 0.0]):
        theta = jnp.array(target)
        z0 = jnp.array([1.0, 0.1, 0.1, 1.0, 0.1, 0.1])
        sol = solve(z0, theta)
        assert bool(sol.converged), target
        np.testing.assert_allclose(
            np.asarray(sol.z[0:3]), _soc_project(np.asarray(theta)),
            atol=1e-4, err_msg=str(target))


def test_mehrotra_matches_and_saves_iterations():
    """Predictor-corrector: same solutions, fewer Newton iterations."""
    base = IPOptions(r_tol=1e-10, kappa_tol=1e-8)
    meh = IPOptions(r_tol=1e-10, kappa_tol=1e-8, mehrotra=True)
    s0 = jax.jit(make_solver(_nn_lsq_residual, _NN_SPEC, base))
    s1 = jax.jit(make_solver(_nn_lsq_residual, _NN_SPEC, meh))
    z0 = jnp.array([0.0, 0.0, 1.0, 1.0, 1.0, 1.0])
    # includes a degenerate lane (theta=0: weakly active constraint)
    for target in ([0.7, -1.3], [2.0, 0.1], [-0.5, -0.5], [0.0, 3.0]):
        theta = jnp.array(target)
        a = s0(z0, theta)
        b = s1(z0, theta)
        assert bool(b.converged), target
        np.testing.assert_allclose(b.z[0:2], jnp.maximum(theta, 0.0),
                                   atol=1e-4)
        assert int(b.iterations) <= int(a.iterations), target

    soc = jax.jit(make_solver(_soc_proj_residual, _SOC_SPEC, meh))
    for target in ([0.1, 1.0, -0.5], [2.0, 0.3, 0.1], [1.0, 1.0, 0.0]):
        theta = jnp.array(target)
        sol = soc(jnp.array([1.0, 0.1, 0.1, 1.0, 0.1, 0.1]), theta)
        assert bool(sol.converged), target
        np.testing.assert_allclose(
            np.asarray(sol.z[0:3]), _soc_project(np.asarray(theta)),
            atol=1e-4, err_msg=str(target))


def test_mehrotra_batched_matches_single():
    from optimization_dynamics_tpu.solver.interior_point import (
        make_solver_batched)
    meh = IPOptions(r_tol=1e-10, kappa_tol=1e-8, mehrotra=True)
    bs = jax.jit(make_solver_batched(_nn_lsq_residual, _NN_SPEC, meh))
    thetas = jnp.array([[0.7, -1.3], [2.0, 0.1], [-0.5, -0.5], [0.0, 3.0]])
    z0s = jnp.tile(jnp.array([0.0, 0.0, 1.0, 1.0, 1.0, 1.0]), (4, 1))
    sols = bs(z0s, thetas)
    assert bool(jnp.all(sols.converged))
    np.testing.assert_allclose(
        sols.z[:, 0:2], jnp.maximum(thetas, 0.0), atol=1e-4)


def test_vmapped_solve():
    """The solver must vmap over scenario batches (while_loop batching)."""
    opts = IPOptions(r_tol=1e-10, kappa_tol=1e-8)
    solve = make_solver(_nn_lsq_residual, _NN_SPEC, opts)
    thetas = jnp.array([[0.7, -1.3], [2.0, 0.1], [-0.5, -0.5], [0.0, 3.0]])
    z0 = jnp.tile(jnp.array([0.0, 0.0, 1.0, 1.0, 1.0, 1.0]), (4, 1))
    sols = jax.jit(jax.vmap(solve))(z0, thetas)
    assert bool(jnp.all(sols.converged))
    np.testing.assert_allclose(
        sols.z[:, 0:2], jnp.maximum(thetas, 0.0), atol=1e-4)
