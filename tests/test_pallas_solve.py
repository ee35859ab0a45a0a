"""Batched QR solve kernel: XLA reference + Pallas interpret mode."""

import jax.numpy as jnp
import numpy as np
import pytest

from optimization_dynamics_tpu.ops.pallas.batched_solve import (
    batched_solve,
    batched_solve_reference,
)


def _random_systems(B=24, n=9, k=2, seed=0, cond_boost=3.0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(B, n, n)).astype(np.float32)
    A = A + cond_boost * np.eye(n, dtype=np.float32)
    b = rng.normal(size=(B, n, k)).astype(np.float32)
    return jnp.asarray(A), jnp.asarray(b)


def test_reference_matches_linalg():
    A, b = _random_systems()
    x = batched_solve_reference(A, b)
    x_ref = jnp.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               atol=1e-3)


def test_pallas_interpret_matches_linalg():
    A, b = _random_systems(B=130, n=12, k=1)   # exercises lane padding
    x = batched_solve(A, b, interpret=True)
    x_ref = jnp.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=1e-3, atol=1e-3)


def test_kkt_like_systems():
    """Unsymmetric KKT-style matrices (zero diagonal blocks) still solve —
    QR needs no pivoting."""
    rng = np.random.default_rng(1)
    B, m = 16, 5
    n = 2 * m
    A = np.zeros((B, n, n), np.float32)
    for i in range(B):
        H = rng.normal(size=(m, m)).astype(np.float32)
        H = H @ H.T + 0.5 * np.eye(m, dtype=np.float32)
        C = rng.normal(size=(m, m)).astype(np.float32)
        A[i, :m, :m] = H
        A[i, :m, m:] = C.T
        A[i, m:, :m] = C
        # zero lower-right block: classic saddle point
    b = rng.normal(size=(B, n, 1)).astype(np.float32)
    x = batched_solve_reference(jnp.asarray(A), jnp.asarray(b))
    res = np.einsum("bij,bjk->bik", A, np.asarray(x)) - b
    assert np.max(np.abs(res)) < 2e-3
