"""Pallas TPU kernel: batched Riccati backward pass, fused.

The iLQR backward recursion is hot loop #2 of the reference's solve
(/root/reference/examples/cartpole.jl:100 -> IterativeLQR's backward
pass; SURVEY.md §3.1). The XLA path (`ilqr_batched.backward`) is a
reverse `lax.scan` whose every step is ~15 tiny einsums + a batched
Cholesky — like the interior-point Newton iteration, it is
latency-bound on TPU: each scan step round-trips HBM for tensors a few
KB wide.

This kernel keeps the whole recursion VMEM-resident with the scenario
batch across the 128 lanes (the batch-across-lanes layout of
`ops/pallas/batched_solve.py`): per grid step, one 128-lane block runs
all T-1 Riccati steps as straight-line VPU code (the time loop unrolls
at trace time — T is static and <= ~100 for every model in the suite,
SURVEY.md §2.2).

Numerics match `ilqr_batched.backward_xla` exactly: Gauss-Newton
Q-terms, `u_mask`-masked control dims with unit diagonal, per-lane
regularization on the masked diagonal, Cholesky solve (`ok` = every
pivot positive, the kernel analog of the XLA path's isfinite(chol)
test), value symmetrization, expected-decrease terms dV1/dV2 and the
|Qu|_inf gradient norm.

Mosaic lowering rules (learned in ops/pallas/fused_ip.py, all still
load-bearing): no captured consts (the body is traced to a jaxpr and
its constants — u_mask tables, identity templates — are threaded in as
kernel inputs), contractions as broadcast-multiply-reduce (no
lanes-batched tpu.matmul), per-lane flags as f32 (1, L) masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["make_riccati_backward"]

LANES = 128


def _chol_solve_block(A, b):
    """Cholesky solve for one lanes-batched block.

    A (n, n, L) symmetric positive definite, b (n, k, L) ->
    (x (n, k, L), ok (1, L) f32 1.0 where every pivot was positive).
    Full-shape masked updates, fully unrolled: no scatters, no gathers.
    """
    n = A.shape[0]
    Lm = jnp.zeros_like(A)
    ok = jnp.ones((1, A.shape[2]), A.dtype)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)        # (n, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)     # (1, n, 1)

    for j in range(n):
        colA = A[:, j, :]                                        # (n, L)
        if j > 0:
            colA = colA - jnp.sum(Lm[:, :j, :] * Lm[j:j + 1, :j, :],
                                  axis=1)
        d = colA[j][None, :]                                     # (1, L)
        ok = ok * (d > 0.0).astype(A.dtype)
        sq = jnp.sqrt(jnp.maximum(d, 1e-30))
        colL = colA / sq
        colL = jnp.where(row == j, sq, colL)
        colL = jnp.where(row < j, 0.0, colL)
        Lm = jnp.where(col == j, colL[:, None, :], Lm)

    # forward substitution  L y = b
    y = jnp.zeros_like(b)
    for i in range(n):
        li = jnp.where((row[:, 0] < i)[:, None], Lm[i], 0.0)     # (n, L)
        acc = b[i] - jnp.sum(li[:, None, :] * y, axis=0)         # (k, L)
        diag = Lm[i, i, :]
        safe = jnp.where(diag > 1e-30, diag, 1.0)
        y = jnp.where((row[:, 0] == i)[:, None, None],
                      (acc / safe[None, :])[None], y)

    # back substitution  L^T x = y   (row i of L^T is column i of L)
    x = jnp.zeros_like(y)
    for i in range(n - 1, -1, -1):
        ui = jnp.where((row[:, 0] > i)[:, None], Lm[:, i, :], 0.0)
        acc = y[i] - jnp.sum(ui[:, None, :] * x, axis=0)
        diag = Lm[i, i, :]
        safe = jnp.where(diag > 1e-30, diag, 1.0)
        x = jnp.where((row[:, 0] == i)[:, None, None],
                      (acc / safe[None, :])[None], x)
    return x, ok


def _make_body(T, nx, nu, u_mask_np):
    """Value-form recursion: arrays in -> (Ks, ks, stats) out. Traced to
    a jaxpr so its constants can be lifted into kernel inputs."""
    eye_nu = np.eye(nu, dtype=np.float32)

    def body(fxs, fus, lxs, lus, lxxs, luus, luxs, Vx, Vxx, reg):
        L = reg.shape[1]
        dtype = Vx.dtype
        dV1 = jnp.zeros((1, L), dtype)
        dV2 = jnp.zeros((1, L), dtype)
        qu_inf = jnp.zeros((1, L), dtype)
        ok_all = jnp.ones((1, L), dtype)
        Ks = [None] * (T - 1)
        ks = [None] * (T - 1)

        for t in range(T - 2, -1, -1):
            fx = fxs[t]                           # (nx, nx, L)
            fu = fus[t]                           # (nx, nu, L)

            # Q-terms; contractions are broadcast-multiply-reduce
            Qx = lxs[t] + jnp.sum(fx * Vx[:, None, :], axis=0)
            Qu = lus[t] + jnp.sum(fu * Vx[:, None, :], axis=0)
            # VF[i, k] = sum_j Vxx[i, j] fx[j, k]
            VF = jnp.sum(Vxx[:, :, None, :] * fx[None], axis=1)
            Qxx = lxxs[t] + jnp.sum(fx[:, :, None, :] * VF[:, None],
                                    axis=0)
            VFu = jnp.sum(Vxx[:, :, None, :] * fu[None], axis=1)
            Quu = luus[t] + jnp.sum(fu[:, :, None, :] * VFu[:, None],
                                    axis=0)
            Qux = luxs[t] + jnp.sum(fu[:, :, None, :] * VF[:, None],
                                    axis=0)

            # static u_mask for this stage
            m = u_mask_np[t].astype(np.float32)                   # (nu,)
            Qu = Qu * m[:, None]
            Qux = Qux * m[:, None, None]
            mm = np.outer(m, m)[:, :, None]                       # const
            # masked dims: unit diagonal; active dims: per-lane reg
            Quu = (Quu * mm
                   + eye_nu[:, :, None]
                   * (m[:, None, None] * reg[None]
                      + (1.0 - m)[:, None, None]))

            rhs = jnp.concatenate([Qu[:, None, :], Qux], axis=1)
            sol, ok = _chol_solve_block(Quu, rhs)
            k = -sol[:, 0, :]                                     # (nu, L)
            K = -sol[:, 1:, :]                                    # (nu,nx,L)

            Quu_k = jnp.sum(Quu * k[None], axis=1)                # (nu, L)
            Vx = (Qx + jnp.sum(K * Qu[:, None, :], axis=0)
                  + jnp.sum(Qux * k[:, None, :], axis=0)
                  + jnp.sum(K * Quu_k[:, None, :], axis=0))
            # KQ[i, l] = sum_j K[j, i] Qux[j, l]
            KQ = jnp.sum(K[:, :, None, :] * Qux[:, None], axis=0)
            QK = jnp.sum(Quu[:, :, None, :] * K[None], axis=1)
            KWK = jnp.sum(K[:, :, None, :] * QK[:, None], axis=0)
            Vxx = Qxx + KQ + jnp.swapaxes(KQ, 0, 1) + KWK
            Vxx = 0.5 * (Vxx + jnp.swapaxes(Vxx, 0, 1))

            dV1 = dV1 + jnp.sum(k * Qu, axis=0, keepdims=True)
            dV2 = dV2 + 0.5 * jnp.sum(k * Quu_k, axis=0, keepdims=True)
            qu_inf = jnp.maximum(
                qu_inf, jnp.max(jnp.abs(Qu), axis=0, keepdims=True))
            ok_all = ok_all * ok
            Ks[t] = K
            ks[t] = k

        stats = jnp.concatenate([dV1, dV2, qu_inf, ok_all], axis=0)
        return jnp.stack(Ks), jnp.stack(ks), stats

    return body


def make_riccati_backward(T: int, nx: int, nu: int, u_mask,
                          interpret: bool = False):
    """Build ``backward(fxs, fus, lxs, lus, lxxs, luus, luxs, gTs, HTs,
    regs) -> (Ks, ks, dV1, dV2, qu_inf, ok)`` — drop-in for
    ``ilqr_batched.backward_xla`` (same batch-first shapes, f32).

    ``u_mask``: static (T-1, nu) bool array (active control dims per
    stage — the hopper's ragged first step, examples/hopper.jl:52-162).
    """
    u_mask_np = np.asarray(u_mask, bool)
    assert u_mask_np.shape == (T - 1, nu), (u_mask_np.shape, T, nu)
    body = _make_body(T, nx, nu, u_mask_np)

    # const lifting: trace once with x64 off (the kernel pipeline is f32
    # by design), thread array constants in as kernel inputs.
    avals = [
        jax.ShapeDtypeStruct((T - 1, nx, nx, LANES), jnp.float32),  # fxs
        jax.ShapeDtypeStruct((T - 1, nx, nu, LANES), jnp.float32),  # fus
        jax.ShapeDtypeStruct((T - 1, nx, LANES), jnp.float32),      # lxs
        jax.ShapeDtypeStruct((T - 1, nu, LANES), jnp.float32),      # lus
        jax.ShapeDtypeStruct((T - 1, nx, nx, LANES), jnp.float32),  # lxxs
        jax.ShapeDtypeStruct((T - 1, nu, nu, LANES), jnp.float32),  # luus
        jax.ShapeDtypeStruct((T - 1, nu, nx, LANES), jnp.float32),  # luxs
        jax.ShapeDtypeStruct((nx, LANES), jnp.float32),             # gT
        jax.ShapeDtypeStruct((nx, nx, LANES), jnp.float32),         # HT
        jax.ShapeDtypeStruct((1, LANES), jnp.float32),              # regs
    ]
    with jax.enable_x64(False):
        closed = jax.make_jaxpr(body)(*avals)
    consts_in = []
    for c in closed.consts:
        arr = np.asarray(c)
        kind = "bool" if arr.dtype == np.bool_ else "num"
        if kind == "bool":
            arr = arr.astype(np.int32)
        shp = arr.shape
        if arr.ndim == 0:
            arr = arr.reshape(1, 1)
        elif arr.ndim == 1:
            arr = arr.reshape(1, -1)
        consts_in.append((jnp.asarray(arr), kind, shp))
    n_c = len(consts_in)

    def kernel(*refs):
        const_refs = refs[:n_c]
        in_refs = refs[n_c:n_c + 10]
        Ks_ref, ks_ref, stats_ref = refs[n_c + 10:]
        cvals = []
        for r, (_, kind, shp) in zip(const_refs, consts_in):
            v = r[...].reshape(shp)
            if kind == "bool":
                v = v.astype(jnp.bool_)
            cvals.append(v)
        Ks, ks, stats = jax.core.eval_jaxpr(
            closed.jaxpr, cvals, *[r[...] for r in in_refs])
        Ks_ref[...] = Ks
        ks_ref[...] = ks
        stats_ref[...] = stats

    @jax.jit
    def backward(fxs, fus, lxs, lus, lxxs, luus, luxs, gTs, HTs, regs):
        B = fxs.shape[0]
        Bp = ((B + LANES - 1) // LANES) * LANES
        pad = Bp - B

        def prep(a, pad_first=False):
            a = a.astype(jnp.float32)
            if pad:
                if pad_first:   # keep padded lanes numerically benign
                    fill = jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])
                else:
                    fill = jnp.zeros((pad,) + a.shape[1:], jnp.float32)
                a = jnp.concatenate([a, fill], axis=0)
            return jnp.moveaxis(a, 0, -1)     # batch -> lanes (last)

        regs_p = regs.astype(jnp.float32)
        if pad:
            regs_p = jnp.concatenate(
                [regs_p, jnp.ones((pad,), jnp.float32)])
        ins = [prep(fxs, True), prep(fus, True), prep(lxs), prep(lus),
               prep(lxxs, True), prep(luus, True), prep(luxs),
               prep(gTs), prep(HTs, True), regs_p[None, :]]
        grid = (Bp // LANES,)

        def bspec(a):
            shp = a.shape[:-1] + (LANES,)
            nd = a.ndim
            return pl.BlockSpec(shp,
                                lambda i, nd=nd: (0,) * (nd - 1) + (i,),
                                memory_space=pltpu.VMEM)

        const_specs = [
            pl.BlockSpec(c.shape, (lambda i, nd=c.ndim: (0,) * nd),
                         memory_space=pltpu.VMEM)
            for c, _, _ in consts_in
        ]
        Ks, ks, stats = pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((T - 1, nu, nx, Bp), jnp.float32),
                jax.ShapeDtypeStruct((T - 1, nu, Bp), jnp.float32),
                jax.ShapeDtypeStruct((4, Bp), jnp.float32),
            ],
            grid=grid,
            in_specs=const_specs + [bspec(a) for a in ins],
            out_specs=[
                pl.BlockSpec((T - 1, nu, nx, LANES),
                             lambda i: (0, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T - 1, nu, LANES), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, LANES), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
            interpret=interpret,
        )(*[c for c, _, _ in consts_in], *ins)
        Ks = jnp.moveaxis(Ks, -1, 0)[:B]      # (B, T-1, nu, nx)
        ks = jnp.moveaxis(ks, -1, 0)[:B]
        stats = jnp.moveaxis(stats, -1, 0)[:B]
        return (Ks, ks, stats[:, 0], stats[:, 1], stats[:, 2],
                stats[:, 3] > 0.5)

    return backward
