"""Pallas TPU kernel: batched small dense linear solves.

The interior-point hot loop factorizes thousands of tiny (nz <= 35) KKT
systems per Newton iteration — far below MXU tile size, so the natural
TPU mapping is *batch-across-lanes*: the batch axis lives on the 128-wide
lane dimension and each (n x n) system occupies sublanes. One kernel
fuses the whole factorize+solve, replacing XLA's batched LU (which
round-trips HBM between factorization steps).

Algorithm: Householder QR + back-substitution. QR needs no pivoting
(row exchanges across sublanes would be per-lane gathers, which the VPU
cannot vectorize), and is backward-stable for the well-scaled,
kappa-regularized KKT matrices produced by the solver.

Layout: A as (n, n, 128) per grid step — last dim = lanes (batch), f32.
All loop bounds are static (n is a Python int), so the kernel unrolls to
straight-line VPU code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["batched_solve", "batched_solve_reference"]

LANES = 128


def _qr_solve_block(A, b):
    """Solve A x = b for one (n, n, L) / (n, k, L) block via Householder QR.

    Pure jnp on fixed shapes, written as full-shape masked updates (no
    sliced scatters — Pallas/Mosaic-friendly, straight-line VPU code).
    Batch axis is last; loop indices are Python ints (fully unrolled).
    """
    n = A.shape[0]
    R = A
    y = b
    row = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)     # (n, 1)

    for i in range(n):
        col = R[:, i, :]                       # (n, L)
        below = row >= i
        x = jnp.where(below, col, 0.0)
        normx = jnp.sqrt(jnp.sum(x * x, axis=0, keepdims=True))  # (1, L)
        x0 = col[i][None, :]                   # (1, L) static row read
        sign = jnp.where(x0 >= 0, 1.0, -1.0)
        alpha = -sign * normx
        # v = x with row i replaced by x0 - alpha
        v = jnp.where(row == i, x0 - alpha, x)
        vnorm2 = jnp.sum(v * v, axis=0, keepdims=True)
        inv = jnp.where(vnorm2 > 0, 2.0 / jnp.where(vnorm2 > 0, vnorm2, 1.0),
                        0.0)                   # (1, L)

        # H = I - inv v v^T applied to R (columns >= i) and to y (all).
        # Contractions as broadcast-multiply-reduce: Mosaic's tpu.matmul
        # cannot express a lanes-batched matvec ("batch dims must be
        # equal"), and at n <= 35 the VPU form is the right shape anyway.
        w = jnp.sum(v[:, None, :] * R, axis=0)             # (n, L)
        R_new = R - inv[None, :, :] * v[:, None, :] * w[None, :, :]
        colmask = (row >= i)[None, :, 0:1]     # (1, n, 1) over column axis
        R = jnp.where(colmask, R_new, R)
        wy = jnp.sum(v[:, None, :] * y, axis=0)            # (k, L)
        y = y - inv[None, :, :] * v[:, None, :] * wy[None, :, :]

    # back substitution on the upper-triangular R
    xsol = jnp.zeros_like(y)
    for i in range(n - 1, -1, -1):
        r_i = jnp.where((row[:, 0] > i)[:, None], R[i], 0.0)   # (n, L)
        acc = y[i] - jnp.sum(r_i[:, None, :] * xsol, axis=0)   # (k, L)
        diag = R[i, i, :]
        safe = jnp.where(jnp.abs(diag) > 1e-30, diag, 1.0)
        upd = (acc / safe[None, :])[None, :, :]                # (1, k, L)
        is_i = (row[:, 0] == i)[:, None, None]                 # (n, 1, 1)
        xsol = jnp.where(is_i, upd, xsol)
    return xsol


def _kernel(a_ref, b_ref, out_ref, *, n, k):
    A = a_ref[...]
    b = b_ref[...]
    out_ref[...] = _qr_solve_block(A, b)


def batched_solve_reference(A, b):
    """XLA reference implementation (same math, batch-last layout
    internally). A: (B, n, n); b: (B, n, k) -> (B, n, k)."""
    At = jnp.moveaxis(A, 0, -1)
    bt = jnp.moveaxis(b, 0, -1)
    xt = _qr_solve_block(At, bt)
    return jnp.moveaxis(xt, -1, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def batched_solve(A, b, interpret: bool = False):
    """Batched dense solve via the Pallas QR kernel.

    A: (B, n, n) f32; b: (B, n, k) -> x: (B, n, k). B is padded to a
    multiple of 128 lanes internally.
    """
    B, n, _ = A.shape
    k = b.shape[2]
    Bp = ((B + LANES - 1) // LANES) * LANES
    pad = Bp - B
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), (pad, n, n))
        A = jnp.concatenate([A, eye], axis=0)
        b = jnp.concatenate([b, jnp.zeros((pad, n, k), b.dtype)], axis=0)

    At = jnp.moveaxis(A, 0, -1)               # (n, n, Bp)
    bt = jnp.moveaxis(b, 0, -1)               # (n, k, Bp)

    grid = (Bp // LANES,)
    out = pl.pallas_call(
        functools.partial(_kernel, n=n, k=k),
        out_shape=jax.ShapeDtypeStruct((n, k, Bp), A.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, k, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(At, bt)
    x = jnp.moveaxis(out, -1, 0)
    return x[:B]
