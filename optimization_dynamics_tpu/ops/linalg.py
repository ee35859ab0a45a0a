"""Linear-solve dispatch for the interior-point Newton systems.

``newton_solve(A, b)`` is what the IP solver calls per scenario. Under
``jax.vmap`` (scenario batches, horizon-parallel derivative sweeps) the
``custom_vmap`` rule reroutes the whole batch to the fused Pallas QR
kernel on TPU (batch-across-lanes; see ops/pallas/batched_solve.py),
while the unbatched call and all CPU paths use XLA's LU.

Enable with ``use_pallas_solver(True)`` (off by default: numerically the
two paths agree to f32 round-off, but LU in f64 is the reference-accurate
default for CPU testing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["newton_solve", "batched_newton_solve", "use_pallas_solver"]

_USE_PALLAS = False


def use_pallas_solver(enable: bool = True) -> None:
    global _USE_PALLAS
    _USE_PALLAS = enable


@jax.custom_batching.custom_vmap
def _pallas_dispatch_solve(A, b):
    return jnp.linalg.solve(A, b[..., None])[..., 0]


@_pallas_dispatch_solve.def_vmap
def _pallas_dispatch_solve_vmap(axis_size, in_batched, A, b):
    from optimization_dynamics_tpu.ops.pallas.batched_solve import (
        batched_solve,
    )
    A_batched, b_batched = in_batched
    if not A_batched:
        A = jnp.broadcast_to(A, (axis_size,) + A.shape)
    if not b_batched:
        b = jnp.broadcast_to(b, (axis_size,) + b.shape)
    out = batched_solve(A, b[..., None])[..., 0]
    return out, True


def newton_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``A x = b`` for one (n, n) system; batch-aware under vmap."""
    if _USE_PALLAS and A.dtype == jnp.float32:
        return _pallas_dispatch_solve(A, b)
    return jnp.linalg.solve(A, b)


def batched_newton_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve a stack of systems: A (B, n, n), b (B, n, k) -> (B, n, k).

    The batched-native solvers' linear-algebra entry point: dispatches to
    the fused Pallas QR kernel when enabled (f32, TPU layouts), XLA's
    batched LU otherwise.
    """
    if _USE_PALLAS and A.dtype == jnp.float32:
        from optimization_dynamics_tpu.ops.pallas.batched_solve import (
            batched_solve,
        )
        return batched_solve(A, b)
    return jnp.linalg.solve(A, b)
