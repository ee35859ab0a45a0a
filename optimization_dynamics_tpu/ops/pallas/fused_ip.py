"""Pallas TPU kernel: the entire interior-point solve, fused.

Motivation (measured, docs/DESIGN.md §6): the batched-native IP solver
sustains ~16.5k steps/s on one v5e chip *independent of batch width* —
each Newton while-iteration is ~50 tiny HBM-roundtrip XLA ops with ~4-5ms
of fixed latency, so rollouts and line searches are latency-bound, three
orders of magnitude off the arithmetic ceiling. This kernel keeps the
whole path-following solve (residual, jacfwd Jacobian, QR solve,
fraction-to-boundary, candidate line search, kappa schedule, stall
recovery) resident in VMEM with the scenario batch across the 128 lanes,
eliminating the per-op overhead.

Semantics match ``interior_point.make_solver_batched`` with the geometric
kappa schedule (no Mehrotra inside the kernel): damped Newton on the
kappa-relaxed residual, vectorized backtracking line search with
first-improvement pick, lane-masked freezing of converged lanes, one-shot
cone reinit on stall. Model residuals are arbitrary pure-JAX functions:
they are ``vmap``-ed to the kernel's batch-last layout at trace time —
the TPU replacement for the reference's Symbolics codegen
(/root/reference/src/models/*/codegen.jl), now landing inside one Mosaic
kernel instead of one XLA op per expression.

Fixed iteration budget: a ``fori_loop`` over ``opts.max_iter`` with
per-lane convergence masks (converged lanes freeze; the loop always runs
the full budget — at ~tens of microseconds per fused iteration this is
cheaper than any early-exit machinery).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from optimization_dynamics_tpu.ops.cones import ConeSpec
from optimization_dynamics_tpu.ops.pallas.batched_solve import (
    _qr_solve_block,
)
from optimization_dynamics_tpu.solver.interior_point import (
    IPOptions,
    IPSolution,
    _cone_reset,
    _row_masks,
)

__all__ = ["make_fused_ip_solver", "make_ip_body", "lift_consts",
           "unpack_consts", "pick_lanes"]

LANES = 128
_BIG = 1e12


def _orthant_alpha(z_o, d_o):
    """Max alpha with ``z_o - alpha d_o >= 0``; blocks (k, L) -> (1, L).

    All per-lane quantities in this module stay 2-D (1, L): Mosaic cannot
    lower 1-D (L,) boolean vectors (i1 truncation), and 2-D blocks map
    cleanly onto (sublane, lane) vregs.
    """
    ratio = jnp.where(d_o > 0, z_o / jnp.where(d_o > 0, d_o, 1.0), _BIG)
    return jnp.min(ratio, axis=0, keepdims=True)


def _soc_alpha(z_g, d_g):
    """Max alpha keeping ``z_g - alpha d_g`` in the SOC; (k, L) -> (1, L)."""
    z0, z1 = z_g[0:1], z_g[1:]
    d0, d1 = d_g[0:1], d_g[1:]
    A = d0 * d0 - jnp.sum(d1 * d1, axis=0, keepdims=True)
    Bq = -2.0 * (z0 * d0 - jnp.sum(z1 * d1, axis=0, keepdims=True))
    C = z0 * z0 - jnp.sum(z1 * z1, axis=0, keepdims=True)
    a_axis = jnp.where(d0 > 0, z0 / jnp.where(d0 > 0, d0, 1.0), _BIG)
    disc = Bq * Bq - 4.0 * A * C
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    safe_A = jnp.where(jnp.abs(A) > 1e-30, A, 1.0)
    r1 = (-Bq - sq) / (2.0 * safe_A)
    r2 = (-Bq + sq) / (2.0 * safe_A)
    lo = jnp.minimum(r1, r2)
    hi = jnp.maximum(r1, r2)
    quad = jnp.where(lo > 0, lo, jnp.where(hi > 0, hi, _BIG))
    lin = jnp.where(jnp.abs(Bq) > 1e-30,
                    -C / jnp.where(jnp.abs(Bq) > 1e-30, Bq, 1.0), _BIG)
    lin = jnp.where(lin > 0, lin, _BIG)
    root = jnp.where(jnp.abs(A) > 1e-30, quad, lin)
    root = jnp.where(disc >= 0, root, _BIG)
    return jnp.minimum(root, a_axis)



def pick_lanes(nz: int, lanes: int | None) -> int:
    """Scenario lanes per kernel grid step. Default 128 (one full vreg
    lane dim); 32 for nz > 24 — the register pressure of the
    jacfwd-unrolled Jacobian + QR chain scales ~ nz^2 x lanes, and at
    nz=35 x 128 lanes the Mosaic register allocator spills 167 MB of
    scoped VMEM against the 128 MB cap (logs/push_kernel_compile2.log;
    docs/DESIGN.md 4b)."""
    return int(lanes) if lanes is not None else (LANES if nz <= 24
                                                 else 32)


def lift_consts(closed):
    """Pallas forbids captured array constants: convert a closed jaxpr's
    consts into kernel-input descriptors ``(array, kind, orig_shape)``.
    Bools travel as i32; 0/1-D consts are reshaped >=2-D."""
    consts_in = []
    for c in [np.asarray(c) for c in closed.consts]:
        kind = ("bool" if c.dtype == np.bool_ else "num")
        arr = c.astype(np.int32) if kind == "bool" else c
        shp = arr.shape
        if arr.ndim == 0:
            arr = arr.reshape(1, 1)
        elif arr.ndim == 1:
            arr = arr.reshape(1, -1)
        consts_in.append((jnp.asarray(arr), kind, shp))
    return consts_in


def unpack_consts(const_refs, consts_in):
    """Kernel-side inverse of ``lift_consts``."""
    cvals = []
    for r, (_, kind, shp) in zip(const_refs, consts_in):
        v = r[...].reshape(shp)
        if kind == "bool":
            v = v.astype(jnp.bool_)
        cvals.append(v)
    return cvals


def make_ip_body(residual_fn: Callable, spec: ConeSpec, opts: IPOptions,
                 early_exit: bool = True, _ablate: str = "") -> Callable:
    """Build the pure batch-last IP-solve body used inside Pallas kernels.

    Returns ``body(z0 (nz, L), theta (nth, L)) -> (z, stats (4, L))`` —
    plain JAX on batch-last blocks, safe to trace into a kernel jaxpr
    (``make_fused_ip_solver``) or compose into larger fused kernels
    (``fused_rollout``). Stats rows: iterations, converged, r_vio,
    kappa_vio.
    """
    spec.validate()
    nz = spec.nz
    has_cones = bool(spec.ort_prim) or bool(spec.soc_prim)
    kappa_final = opts.kappa_final_frac * opts.kappa_tol
    kappa_lo = max(kappa_final, opts.kappa_init_min) if has_cones \
        else kappa_final

    # batch-last model functions (vmapped at trace time, inside the kernel)
    res_bl = jax.vmap(residual_fn, in_axes=(1, 1, None), out_axes=1)
    if "nores" in _ablate:                  # ablation timing only
        res_bl = lambda z, th, k: (z * 0.5
                                   + 0.1 * jnp.sum(th, axis=0,
                                                   keepdims=True))
    jac_bl = jax.vmap(jax.jacfwd(lambda z, th: residual_fn(z, th, 0.0)),
                      in_axes=(1, 1), out_axes=2)

    eq_np, bil_np, head_np = _row_masks(spec, jnp.float32)
    eq_m = np.asarray(eq_np)[:, None]          # (nz, 1) for broadcasting
    bil_m = np.asarray(bil_np)[:, None]
    head_m = np.asarray(head_np)[:, None]
    reset_mask_np, reset_tmpl_np = _cone_reset(spec, jnp.float32)
    reset_m = np.asarray(reset_mask_np)[:, None].astype(np.float32)
    reset_t = np.asarray(reset_tmpl_np)[:, None]

    def _sel(idx):
        """Constant 0/1 selection matrix: rows pick z entries. Mosaic has
        no general gather; a tiny const matmul selects rows instead."""
        S = np.zeros((len(idx), nz), np.float32)
        S[np.arange(len(idx)), np.asarray(idx)] = 1.0
        return S

    ort_sel = (_sel(list(spec.ort_prim) + list(spec.ort_dual))
               if (spec.ort_prim or spec.ort_dual) else None)
    soc_sels = [(_sel(p), _sel(d))
                for p, d in zip(spec.soc_prim, spec.soc_dual)]

    def boundary_alpha(z, d):
        """(nz, L) blocks -> (1, L) max feasible step."""
        a = jnp.full((1, z.shape[1]), _BIG, z.dtype)
        if ort_sel is not None:
            a = jnp.minimum(a, _orthant_alpha(ort_sel @ z, ort_sel @ d))
        for Sp, Sd in soc_sels:
            a = jnp.minimum(a, _soc_alpha(Sp @ z, Sp @ d))
            a = jnp.minimum(a, _soc_alpha(Sd @ z, Sd @ d))
        return jnp.minimum(a, 1.0)

    def merit_of(r0, kappa):
        # r0 (nz, L), kappa (1, L) -> (1, L)
        return jnp.max(jnp.abs(r0 - kappa * head_m), axis=0, keepdims=True)

    def _body(z0, theta):
        """Pure kernel body: (nz, L), (nth, L) -> (z, stats). Traced to a
        jaxpr so its array constants (cone masks, model index tables) can
        be threaded in as kernel inputs — Pallas forbids captured consts.
        Per-lane flags stay f32 (1, L) masks: Mosaic cannot lower 1-D
        boolean vectors."""
        L = z0.shape[1]
        one = jnp.ones((1, L), z0.dtype)
        zero = jnp.zeros((1, L), z0.dtype)

        r0 = res_bl(z0, theta, 0.0)
        kv0 = jnp.max(jnp.abs(r0) * bil_m, axis=0, keepdims=True)
        if has_cones:
            kappa0 = jnp.clip(kv0, kappa_lo, opts.kappa_init_max)
        else:
            kappa0 = jnp.full((1, L), kappa_final, z0.dtype)

        def conv_mask(r0):
            # f32 mask (1, L): 1.0 where converged
            m = merit_of(r0, jnp.full((1, L), kappa_final, z0.dtype))
            return (m < opts.r_tol).astype(z0.dtype)

        def body(_, carry):
            z, kappa, r0, it, stalled, reinit = carry
            active = (1.0 - conv_mask(r0)) * (1.0 - stalled)   # (1, L)

            if "nojac" in _ablate:             # ablation timing only
                J = jnp.broadcast_to(
                    jnp.eye(nz, dtype=z.dtype)[:, :, None],
                    (nz, nz, L)) + z[:, None, :] * 0.0
            else:
                J = jac_bl(z, theta)               # (nz, nz, L)
            if opts.gamma_reg > 0.0:
                J = J + (opts.gamma_reg * kappa)[None] \
                    * jnp.eye(nz, dtype=z.dtype)[:, :, None]
            r_k = r0 - kappa * head_m
            merit_cur = jnp.max(jnp.abs(r_k), axis=0, keepdims=True)
            if "noqr" in _ablate:              # ablation timing only
                delta = r_k + jnp.sum(J, axis=1) * 1e-30
            else:
                delta = _qr_solve_block(J, r_k[:, None, :])[:, 0, :]

            tau = jnp.clip(1.0 - merit_cur, opts.tau_min, opts.tau_max)
            if "nobound" in _ablate:           # ablation timing only
                alpha0 = tau
            else:
                alpha0 = jnp.minimum(boundary_alpha(z, delta) * tau, 1.0)

            # candidate sweep, first-improvement pick (branch-free masks)
            found = zero
            best_a = zero
            best_m = jnp.full((1, L), _BIG, z.dtype)
            min_a = alpha0
            min_m = jnp.full((1, L), _BIG, z.dtype)
            n_ls = 0 if "nols" in _ablate else opts.max_ls
            for j in range(n_ls):
                a_j = alpha0 * (0.5 ** j)
                m_j = merit_of(res_bl(z - a_j * delta, theta, 0.0), kappa)
                better = (m_j < merit_cur).astype(z.dtype)
                take = better * (1.0 - found)
                best_a = take * a_j + (1.0 - take) * best_a
                best_m = take * m_j + (1.0 - take) * best_m
                found = jnp.maximum(found, better)
                tmin = (m_j < min_m).astype(z.dtype)
                min_a = tmin * a_j + (1.0 - tmin) * min_a
                min_m = tmin * m_j + (1.0 - tmin) * min_m
            alpha = found * best_a + (1.0 - found) * min_a
            new_merit = found * best_m + (1.0 - found) * min_m
            stalled_new = 1.0 - found

            z_new = z - alpha * delta
            centered = (new_merit < jnp.maximum(
                opts.center_frac * kappa, opts.r_tol)).astype(z.dtype)
            kappa_adv = jnp.maximum(kappa * opts.kappa_scale, kappa_final)
            kappa_new = centered * kappa_adv + (1.0 - centered) * kappa

            if has_cones:
                do_reinit = stalled_new * (1.0 - reinit)
                z_reset = reset_m * reset_t + (1.0 - reset_m) * z_new
                z_new = do_reinit * z_reset + (1.0 - do_reinit) * z_new
                stalled_new = stalled_new * reinit
                reinit = jnp.maximum(reinit, do_reinit)

            z_new = active * z_new + (1.0 - active) * z
            kappa_new = active * kappa_new + (1.0 - active) * kappa
            stalled = active * stalled_new + (1.0 - active) * stalled

            r0_new = res_bl(z_new, theta, 0.0)
            if has_cones:
                kv_new = jnp.max(jnp.abs(r0_new) * bil_m, axis=0,
                                 keepdims=True)
                take_k = active * do_reinit
                kappa_new = take_k * jnp.clip(kv_new, kappa_lo,
                                              opts.kappa_init_max) \
                    + (1.0 - take_k) * kappa_new
            it = it + active
            return (z_new, kappa_new, r0_new, it, stalled, reinit)

        init = (z0, kappa0.astype(z0.dtype), r0, zero, zero, zero)
        if early_exit:
            # while-loop with a scalar all-lanes-done test: warm-started
            # steps converge in ~8-12 iterations, so exiting early beats
            # the fixed max_iter fori budget ~3x on rollouts
            def w_cond(c):
                i, carry = c
                _, _, r0_c, _, stalled_c, _ = carry
                act = (1.0 - conv_mask(r0_c)) * (1.0 - stalled_c)
                return jnp.logical_and(i < opts.max_iter,
                                       jnp.max(act) > 0.0)

            def w_body(c):
                i, carry = c
                return (i + 1, body(i, carry))

            _, (z, kappa, r0, it, _, _) = jax.lax.while_loop(
                w_cond, w_body, (jnp.asarray(0, jnp.int32), init))
        else:
            z, kappa, r0, it, _, _ = jax.lax.fori_loop(
                0, opts.max_iter, body, init)

        rv = jnp.max(jnp.abs(r0) * eq_m, axis=0, keepdims=True)
        kv = jnp.max(jnp.abs(r0) * bil_m, axis=0, keepdims=True)
        stats = jnp.concatenate([it, conv_mask(r0), rv, kv], axis=0)
        return z, stats

    return _body

def make_fused_ip_solver(residual_fn: Callable, spec: ConeSpec,
                         opts: IPOptions,
                         interpret: bool = False,
                         early_exit: bool = True,
                         lanes: int | None = None,
                         _ablate: str = "") -> Callable:
    """Build ``solve(z0s (B, nz), thetas (B, ntheta)) -> IPSolution``.

    Drop-in for ``make_solver_batched`` (f32; geometric schedule). B is
    padded to a multiple of ``lanes`` internally; each lane block is one
    grid step of the fused kernel.

    ``lanes``: scenario lanes per grid step. Default 128 (one full vreg
    lane dim) for small systems; 32 for nz > 24 — the register pressure
    of the jacfwd-unrolled Jacobian + QR chain scales ~ nz^2 x lanes,
    and at nz=35 x 128 lanes the Mosaic register allocator spills
    167 MB of scoped VMEM against the 128 MB cap
    (logs/push_kernel_compile2.log; docs/DESIGN.md 4b). Narrow blocks
    waste 3/4 of each vreg's lane dim but actually compile.
    """
    spec.validate()
    nz, nth = spec.nz, spec.ntheta
    L_BLK = pick_lanes(nz, lanes)
    _body = make_ip_body(residual_fn, spec, opts, early_exit=early_exit,
                         _ablate=_ablate)

    # ---- const lifting: trace once, thread constants as kernel inputs.
    # Traced with x64 disabled: the kernel pipeline is f32 by design, and
    # model residuals create default-dtype constants that would otherwise
    # promote the carry to f64 under x64 test configs.
    z_aval = jax.ShapeDtypeStruct((nz, L_BLK), jnp.float32)
    th_aval = jax.ShapeDtypeStruct((nth, L_BLK), jnp.float32)
    with jax.enable_x64(False):
        closed = jax.make_jaxpr(_body)(z_aval, th_aval)
    consts_in = lift_consts(closed)
    n_c = len(consts_in)

    def _kernel(*refs):
        const_refs = refs[:n_c]
        z0_ref, th_ref, z_ref, stats_ref = refs[n_c:]
        cvals = unpack_consts(const_refs, consts_in)
        z, stats = jax.core.eval_jaxpr(
            closed.jaxpr, cvals, z0_ref[...], th_ref[...])
        z_ref[...] = z
        stats_ref[...] = stats

    def _kernel3(*refs):
        # narrow-lane variant: blocks are (1, nz, L_BLK) slices of a
        # (nb, nz, L_BLK) array — Pallas requires the last two block
        # dims be 128-divisible OR equal the array dims, so sub-128
        # lane blocks ride a leading grid dimension instead
        const_refs = refs[:n_c]
        z0_ref, th_ref, z_ref, stats_ref = refs[n_c:]
        cvals = unpack_consts(const_refs, consts_in)
        z, stats = jax.core.eval_jaxpr(
            closed.jaxpr, cvals, z0_ref[0], th_ref[0])
        z_ref[0] = z
        stats_ref[0] = stats

    @jax.jit
    def solve(z0s: jnp.ndarray, thetas: jnp.ndarray) -> IPSolution:
        B = z0s.shape[0]
        Bp = ((B + L_BLK - 1) // L_BLK) * L_BLK
        pad = Bp - B
        if pad:
            z0s = jnp.concatenate(
                [z0s, jnp.broadcast_to(z0s[:1], (pad, nz))], axis=0)
            thetas = jnp.concatenate(
                [thetas, jnp.broadcast_to(thetas[:1], (pad, nth))], axis=0)
        nb = Bp // L_BLK
        const_specs = [
            pl.BlockSpec(c.shape, (lambda i, nd=c.ndim: (0,) * nd),
                         memory_space=pltpu.VMEM)
            for c, _, _ in consts_in
        ]
        # the unrolled QR + jacfwd chain peaks slightly above the
        # 16 MB default scoped-vmem budget at nz ~ 10; the kernel's
        # true working set is tiny, so raise the cap. The cap value is
        # PERFORMANCE-load-bearing, not just compile-or-nothing: at
        # lanes=256 the identical kernel ran 148 ms under a 64 MB
        # backend cap vs 31 ms under 128 MB (logs/lanes_sweep_r5.log vs
        # logs/kernel_diag_r5.log) — headroom changes the allocator's
        # spill strategy. The backend-side cap must be raised too
        # (LIBTPU_INIT_ARGS --xla_tpu_scoped_vmem_limit_kib, bench.py).
        cparams = pltpu.CompilerParams(
            vmem_limit_bytes=(128 - 8) * 1024 * 1024
            if L_BLK >= 512 else 64 * 1024 * 1024)
        if L_BLK % LANES == 0:
            zt = jnp.moveaxis(z0s.astype(jnp.float32), 0, -1)   # (nz,Bp)
            tht = jnp.moveaxis(thetas.astype(jnp.float32), 0, -1)
            z_out, stats = pl.pallas_call(
                _kernel,
                out_shape=[
                    jax.ShapeDtypeStruct((nz, Bp), jnp.float32),
                    jax.ShapeDtypeStruct((4, Bp), jnp.float32),
                ],
                grid=(nb,),
                in_specs=const_specs + [
                    pl.BlockSpec((nz, L_BLK), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((nth, L_BLK), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((nz, L_BLK), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((4, L_BLK), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                compiler_params=cparams,
                interpret=interpret,
            )(*[c for c, _, _ in consts_in], zt, tht)
            z = jnp.moveaxis(z_out, -1, 0)[:B]
            stats = jnp.moveaxis(stats, -1, 0)[:B]
        else:
            # narrow-lane path: lane blocks < 128 are illegal as
            # lane-dim BlockSpecs — group lanes on a leading grid dim
            # so each block's last two dims equal the array dims
            z3 = jnp.swapaxes(
                z0s.astype(jnp.float32).reshape(nb, L_BLK, nz), 1, 2)
            th3 = jnp.swapaxes(
                thetas.astype(jnp.float32).reshape(nb, L_BLK, nth), 1, 2)
            z_out, stats = pl.pallas_call(
                _kernel3,
                out_shape=[
                    jax.ShapeDtypeStruct((nb, nz, L_BLK), jnp.float32),
                    jax.ShapeDtypeStruct((nb, 4, L_BLK), jnp.float32),
                ],
                grid=(nb,),
                in_specs=const_specs + [
                    pl.BlockSpec((1, nz, L_BLK), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, nth, L_BLK), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((1, nz, L_BLK), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 4, L_BLK), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                compiler_params=cparams,
                interpret=interpret,
            )(*[c for c, _, _ in consts_in], z3, th3)
            z = jnp.swapaxes(z_out, 1, 2).reshape(Bp, nz)[:B]
            stats = jnp.swapaxes(stats, 1, 2).reshape(Bp, 4)[:B]
        return IPSolution(
            z=z,
            iterations=stats[:, 0].astype(jnp.int32),
            converged=stats[:, 1] > 0.5,
            r_vio=stats[:, 2],
            kappa_vio=stats[:, 3])

    return solve
