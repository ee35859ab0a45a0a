"""Pallas TPU kernel: a whole closed-loop rollout, fused (multi-step).

Round-4 accounting (BASELINE.md) located ~86% of an inner iLQR
iteration's wall in the line-search rollout: a ``lax.scan`` over T-1
steps whose every step is one fused-IP ``pallas_call`` plus ~20 small
XLA glue ops (feedback control, theta packing, state shift). The
per-step kernel *compute* is tens of microseconds; the per-step glue and
kernel launch are not — ~0.94 ms per 128-lane block step, i.e. the
rollout is launch/glue-bound, not compute-bound.

This kernel keeps the ENTIRE rollout resident: grid = (lane blocks,
T-1), with the time axis as the (sequential, innermost) TPU grid
dimension, the current state carried across grid steps in a VMEM
scratch buffer, and per-timestep inputs/outputs streamed by Pallas'
block pipeline. Each grid step computes, batch-last over L lanes:

    u_t = u_ref_t + alpha * k_t + K_t (x_t - x_ref_t)     (feedback)
    theta_t = theta_fn(q0, q1, u_t)                        (data pack)
    z_t = interior_point(init_z(q1), theta_t)              (IP solve,
                                                ops/pallas/fused_ip.py)
    x_{t+1} = [q1; z_t[q_sel]]

replacing T-1 kernel launches + XLA glue with ONE launch. Open-loop
rollouts are the K=k=alpha=0 special case. The per-step IP-solve math is
``fused_ip.make_ip_body`` — bit-identical semantics to the per-step
fused deploy path; only the glue moves into the kernel.

Reference topology: one ``RoboDojo.step!`` per rollout step inside
IterativeLQR's forward pass (/root/reference/src/dynamics.jl:81-94,
SURVEY.md §3.1 HOT LOOP #1); the reference pays a function call per
step where the XLA path paid a dispatch — this kernel pays neither.

The u_mask (time-varying actuation) is folded into K/k outside the
kernel: ``u = where(mask, u_ref + du, u_ref)`` equals premultiplying the
K and k rows by the mask.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from optimization_dynamics_tpu.ops.pallas.fused_ip import (
    LANES,
    lift_consts,
    make_ip_body,
    pick_lanes,
    unpack_consts,
)
from optimization_dynamics_tpu.solver.interior_point import IPOptions

__all__ = ["make_fused_rollout"]


def make_fused_rollout(model, opts: IPOptions, aux, T: int,
                       u_mask=None, interpret: bool = False,
                       lanes: int | None = None) -> Callable:
    """Build the one-kernel rollout for an ``ImplicitModel``.

    Returns ``rollout(x0s (B, nx), xss_ref (B, T, nx),
    uss_ref (B, T-1, nu), Kss (B, T-1, nu, nx), kss (B, T-1, nu),
    alphas (B,)) -> (xss (B, T, nx), uss (B, T-1, nu),
    wss (B, T-1, nz))`` — a drop-in for ``ilqr_batched.closed_loop``'s
    rollout portion with COLD per-step warm starts (``init_z(q1)``, the
    deploy ``ws_linesearch=False`` policy); ``wss`` holds each step's
    IP solution for the derivative sweep's same-theta warm start.

    ``opts`` are the EVAL-tier IP options (rollouts re-solve at
    kappa_eval, /root/reference/src/dynamics.jl:61-65). ``u_mask``:
    optional (T-1, nu) bool array of actuated controls per step.
    f32 end-to-end (the kernel pipeline's dtype); outputs are cast back
    to the input dtype.
    """
    spec = model.spec
    nz, nth = spec.nz, spec.ntheta
    nq, nu = model.nq, model.nu
    nx = 2 * nq
    L_BLK = pick_lanes(nz, lanes)
    ip_body = make_ip_body(model.residual, spec, opts, early_exit=True)

    th_bl = jax.vmap(lambda q0, q1, u: model.theta_fn(q0, q1, u, aux),
                     in_axes=(1, 1, 1), out_axes=1)
    iz_bl = jax.vmap(model.init_z, in_axes=1, out_axes=1)
    q_sel = list(model.q_sel)

    def step_bl(x, xr, ur, Kt, kt, alpha):
        """One rollout step, batch-last f32 blocks:
        x (nx, L), xr (nx, L), ur (nu, L), Kt (nu*nx, L), kt (nu, L),
        alpha (1, L) -> (x_next (nx, L), u (nu, L), z (nz, L)).

        The feedback mat-vec unrolls to multiply-add rows — tiny
        dot_generals do not lower through Mosaic (docs/DESIGN.md 4b)."""
        dx = x - xr
        rows = []
        for i in range(nu):
            acc = alpha * kt[i:i + 1]
            for j in range(nx):
                acc = acc + Kt[i * nx + j:i * nx + j + 1] * dx[j:j + 1]
            rows.append(acc)
        u = ur + jnp.concatenate(rows, axis=0)
        q0 = x[:nq]
        q1 = x[nq:]
        theta = th_bl(q0, q1, u)
        z, _stats = ip_body(iz_bl(q1), theta)
        q2 = jnp.concatenate([z[i:i + 1] for i in q_sel], axis=0)
        x_next = jnp.concatenate([q1, q2], axis=0)
        return x_next, u, z

    # trace once with x64 off (kernel pipeline is f32); consts -> inputs
    av = lambda *s: jax.ShapeDtypeStruct(s, jnp.float32)
    with jax.enable_x64(False):
        closed = jax.make_jaxpr(step_bl)(
            av(nx, L_BLK), av(nx, L_BLK), av(nu, L_BLK),
            av(nu * nx, L_BLK), av(nu, L_BLK), av(1, L_BLK))
    consts_in = lift_consts(closed)
    n_c = len(consts_in)

    def _kernel(*refs):
        const_refs = refs[:n_c]
        (x0_ref, xr_ref, ur_ref, K_ref, k_ref, a_ref,
         ys_ref, us_ref, ws_ref, x_carry) = refs[n_c:]
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            x_carry[...] = x0_ref[...]

        cvals = unpack_consts(const_refs, consts_in)
        x_next, u, z = jax.core.eval_jaxpr(
            closed.jaxpr, cvals, x_carry[...],
            xr_ref[0], ur_ref[0], K_ref[0], k_ref[0], a_ref[...])
        ys_ref[0] = x_next
        us_ref[0] = u
        ws_ref[0] = z
        x_carry[...] = x_next

    mask_np = (None if u_mask is None
               else np.asarray(u_mask, np.float32).reshape(1, T - 1, nu))

    def rollout(x0s, xss_ref, uss_ref, Kss, kss, alphas):
        out_dtype = x0s.dtype
        B = x0s.shape[0]
        Bp = ((B + L_BLK - 1) // L_BLK) * L_BLK
        f32 = jnp.float32
        if mask_np is not None:
            # fold actuation mask into the gains: u = ur + mask * du
            kss = kss * mask_np
            Kss = Kss * mask_np[..., None]

        def padb(a):
            a = a.astype(f32)
            if Bp == B:
                return a
            reps = jnp.broadcast_to(a[:1], (Bp - B,) + a.shape[1:])
            return jnp.concatenate([a, reps], axis=0)

        x0t = jnp.transpose(padb(x0s), (1, 0))                # (nx, Bp)
        xrt = jnp.transpose(padb(xss_ref[:, :-1]), (1, 2, 0))  # (T-1,nx,Bp)
        urt = jnp.transpose(padb(uss_ref), (1, 2, 0))          # (T-1,nu,Bp)
        Kt = jnp.transpose(
            padb(Kss).reshape(Bp, T - 1, nu * nx), (1, 2, 0))
        ktt = jnp.transpose(padb(kss), (1, 2, 0))
        at = padb(alphas[:, None]).reshape(1, Bp)

        nb = Bp // L_BLK
        grid = (nb, T - 1)       # t innermost: sequential carry per block
        const_specs = [
            pl.BlockSpec(c.shape, (lambda b, t, nd=c.ndim: (0,) * nd),
                         memory_space=pltpu.VMEM)
            for c, _, _ in consts_in
        ]
        ys, us, ws = pl.pallas_call(
            _kernel,
            out_shape=[
                jax.ShapeDtypeStruct((T - 1, nx, Bp), f32),
                jax.ShapeDtypeStruct((T - 1, nu, Bp), f32),
                jax.ShapeDtypeStruct((T - 1, nz, Bp), f32),
            ],
            grid=grid,
            in_specs=const_specs + [
                pl.BlockSpec((nx, L_BLK), lambda b, t: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nx, L_BLK), lambda b, t: (t, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nu, L_BLK), lambda b, t: (t, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nu * nx, L_BLK), lambda b, t: (t, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nu, L_BLK), lambda b, t: (t, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L_BLK), lambda b, t: (0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, nx, L_BLK), lambda b, t: (t, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nu, L_BLK), lambda b, t: (t, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nz, L_BLK), lambda b, t: (t, 0, b),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((nx, L_BLK), f32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(*[c for c, _, _ in consts_in], x0t, xrt, urt, Kt, ktt, at)

        xss = jnp.concatenate(
            [x0s.astype(f32)[:, None],
             jnp.transpose(ys, (2, 0, 1))[:B]], axis=1)
        uss = jnp.transpose(us, (2, 0, 1))[:B]
        wss = jnp.transpose(ws, (2, 0, 1))[:B]
        return (xss.astype(out_dtype), uss.astype(out_dtype),
                wss.astype(out_dtype))

    return rollout
