"""Pallas batched Riccati backward pass vs the XLA reverse scan.

The kernel (ops/pallas/riccati.py) must reproduce
``ilqr_batched.backward`` exactly (same Gauss-Newton recursion, masking,
regularization, Cholesky semantics) — interpret mode on CPU, per
SURVEY.md §4's fake-backend strategy. Hot loop #2 of the reference solve
(/root/reference/examples/cartpole.jl:100, SURVEY.md §3.1).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimization_dynamics_tpu.ops.pallas.riccati import (
    make_riccati_backward)
from optimization_dynamics_tpu.solver.ilqr import ILQROptions, ILQRProblem
from optimization_dynamics_tpu.solver.ilqr_batched import (
    make_phases, solve_batched)


def _rand_lqr(key, B, T, nx, nu, u_mask=None):
    ks = jax.random.split(key, 9)
    f32 = jnp.float32
    fxs = 0.5 * jax.random.normal(ks[0], (B, T - 1, nx, nx), f32)
    fus = 0.5 * jax.random.normal(ks[1], (B, T - 1, nx, nu), f32)
    lxs = jax.random.normal(ks[2], (B, T - 1, nx), f32)
    lus = jax.random.normal(ks[3], (B, T - 1, nu), f32)

    def spd(k, n, scale=1.0):
        A = jax.random.normal(k, (B, T - 1, n, n), f32)
        return scale * (jnp.einsum("btij,btkj->btik", A, A)
                        + 0.5 * jnp.eye(n, dtype=f32))

    lxxs = spd(ks[4], nx)
    luus = spd(ks[5], nu)
    luxs = 0.3 * jax.random.normal(ks[6], (B, T - 1, nu, nx), f32)
    gTs = jax.random.normal(ks[7], (B, nx), f32)
    A = jax.random.normal(ks[8], (B, nx, nx), f32)
    HTs = jnp.einsum("bij,bkj->bik", A, A) + jnp.eye(nx, dtype=f32)
    regs = jnp.full((B,), 1.0e-6, f32)
    return fxs, fus, lxs, lus, lxxs, luus, luxs, gTs, HTs, regs


def _xla_backward(T, nx, nu, u_mask=None):
    """Build the XLA reference backward via make_phases on a dummy
    problem with the requested static u_mask."""
    prob = ILQRProblem(
        T=T, nx=nx, nu=nu, ncon=0, nconT=0,
        dynamics=lambda t, x, u: x,
        dynamics_jac=lambda t, x, u: (x, jnp.eye(nx), jnp.zeros((nx, nu))),
        dynamics_batched=lambda t, xs, us: xs,
        stage_cost=lambda t, x, u: jnp.sum(u * u),
        terminal_cost=lambda x: jnp.sum(x * x),
        u_mask=u_mask)
    ph = make_phases(prob, ILQROptions(), B=4, dtype=jnp.float32)
    return ph.backward_xla


@pytest.mark.parametrize("nx,nu,T", [(4, 1, 8), (6, 3, 6), (10, 4, 5)])
def test_kernel_matches_xla_backward(nx, nu, T):
    B = 4
    data = _rand_lqr(jax.random.PRNGKey(0), B, T, nx, nu)
    ref = _xla_backward(T, nx, nu)(*data)
    ker = make_riccati_backward(
        T, nx, nu, np.ones((T - 1, nu), bool), interpret=True)(*data)
    names = ["Ks", "ks", "dV1", "dV2", "qu_inf", "ok"]
    for name, r, k in zip(names, ref, ker):
        r = np.asarray(r, np.float32)
        k = np.asarray(k, np.float32)
        np.testing.assert_allclose(
            k, r, rtol=2e-5, atol=2e-5,
            err_msg=f"{name} mismatch (nx={nx}, nu={nu}, T={T})")


def test_kernel_respects_u_mask():
    """Masked control dims must produce zero gains (the hopper's ragged
    stages, /root/reference/examples/hopper.jl:52-162)."""
    nx, nu, T, B = 4, 3, 6, 4
    u_mask = np.ones((T - 1, nu), bool)
    u_mask[:, 2] = False          # third control inactive everywhere
    u_mask[0, 1] = False          # second inactive at t=0
    data = _rand_lqr(jax.random.PRNGKey(1), B, T, nx, nu)
    ref = _xla_backward(T, nx, nu, u_mask=jnp.asarray(u_mask))(*data)
    ker = make_riccati_backward(T, nx, nu, u_mask, interpret=True)(*data)
    for r, k in zip(ref, ker):
        np.testing.assert_allclose(np.asarray(k, np.float32),
                                   np.asarray(r, np.float32),
                                   rtol=2e-5, atol=2e-5)
    Ks = np.asarray(ker[0])
    assert np.all(Ks[:, :, 2, :] == 0.0)
    assert np.all(Ks[:, 0, 1, :] == 0.0)


def test_kernel_flags_indefinite():
    """A non-PD Quu must clear the ok flag (XLA path: NaN Cholesky)."""
    nx, nu, T, B = 4, 2, 4, 4
    data = list(_rand_lqr(jax.random.PRNGKey(2), B, T, nx, nu))
    luus = np.array(data[5])
    luus[1, 0] = np.array([[-5.0, 0.0], [0.0, -5.0]], np.float32)
    data[5] = jnp.asarray(luus)
    ker = make_riccati_backward(
        T, nx, nu, np.ones((T - 1, nu), bool), interpret=True)(*data)
    ok = np.asarray(ker[5])
    assert not ok[1]
    assert ok[0] and ok[2] and ok[3]


def test_batch_padding():
    """B not a multiple of 128: padded lanes must not disturb results."""
    nx, nu, T = 4, 1, 5
    data3 = _rand_lqr(jax.random.PRNGKey(3), 3, T, nx, nu)
    ker = make_riccati_backward(
        T, nx, nu, np.ones((T - 1, nu), bool), interpret=True)
    out3 = ker(*data3)
    ref = _xla_backward(T, nx, nu)(*data3)
    for r, k in zip(ref, out3):
        np.testing.assert_allclose(np.asarray(k, np.float32),
                                   np.asarray(r, np.float32),
                                   rtol=2e-5, atol=2e-5)


def test_e2e_solve_with_pallas_riccati():
    """Batched double-integrator solve, pallas_riccati vs XLA: same
    trajectories."""
    T, nx, nu, B = 11, 2, 1, 3
    h = 0.1
    A = jnp.array([[1.0, h], [0.0, 1.0]], jnp.float32)
    Bm = jnp.array([[0.0], [h]], jnp.float32)
    xT = jnp.array([1.0, 0.0], jnp.float32)

    prob = ILQRProblem(
        T=T, nx=nx, nu=nu, ncon=0, nconT=0,
        dynamics=lambda t, x, u: A @ x + Bm @ u,
        dynamics_jac=lambda t, x, u: (A @ x + Bm @ u, A, Bm),
        dynamics_batched=lambda t, xs, us: xs @ A.T + us @ Bm.T,
        dynamics_jac_batched=lambda ts, xs, us: (
            xs @ A.T + us @ Bm.T,
            jnp.broadcast_to(A, (xs.shape[0], nx, nx)),
            jnp.broadcast_to(Bm, (xs.shape[0], nx, nu))),
        stage_cost=lambda t, x, u: 0.1 * jnp.sum(u * u),
        terminal_cost=lambda x: 100.0 * jnp.sum((x - xT) ** 2))

    x0s = jnp.zeros((B, nx), jnp.float32) \
        + 0.1 * jax.random.normal(jax.random.PRNGKey(4), (B, nx),
                                  jnp.float32)
    us0 = jnp.zeros((T - 1, nu), jnp.float32)
    opts = ILQROptions(max_iter=30)
    res_xla = solve_batched(prob, x0s, us0, opts)
    res_pal = solve_batched(prob, x0s, us0,
                            dataclasses.replace(opts,
                                                pallas_riccati=True))
    np.testing.assert_allclose(np.asarray(res_pal.xs),
                               np.asarray(res_xla.xs),
                               rtol=1e-4, atol=1e-5)
