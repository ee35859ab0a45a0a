"""Differentiable implicit (optimization-based) dynamics.

TPU-native equivalent of the reference's ``ImplicitDynamics`` adapter
(/root/reference/src/dynamics.jl): a discrete step

    x = [q1; q2]  --IP solve-->  y = [q2; q3]

where ``q3`` solves the model's contact/limit/friction residual. Two solver
configurations implement the paper's smoothed-gradient design
(/root/reference/src/dynamics.jl:51-65):

  * ``eval``  — tight relaxation (``kappa_eval_tol``), used for rollouts;
  * ``grad``  — loose relaxation (``kappa_grad_tol``), whose IFT
    sensitivities are smooth subgradients fed to the trajectory optimizer.

Everything is functional: ``step`` / ``step_jac`` are jit-safe, vmappable
over scenario batches, and usable inside ``lax.scan`` rollouts. ``step`` is
also exposed with a ``jax.custom_vjp`` so arbitrary JAX autodiff (e.g.
policy-gradient losses) differentiates through the solver via the IFT at
the *relaxed* solution — one extra linear solve per cotangent instead of
unrolling the Newton iterations.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from optimization_dynamics_tpu.ops.cones import ConeSpec
from optimization_dynamics_tpu.solver.interior_point import (
    IPOptions,
    IPSolution,
    make_sensitivity,
    make_sensitivity_batched,
    make_solver,
    make_solver_batched,
)

__all__ = [
    "ImplicitModel", "ImplicitDynamics", "make_implicit_dynamics",
    "simulate", "state_to_configuration",
]


class ImplicitModel(NamedTuple):
    """A model's optimization-based dynamics, fully specified.

    ``residual(z, theta, kappa)`` is pure JAX; ``theta_fn(q0, q1, u, aux)``
    packs the problem data (aux carries the timestep and any scenario
    parameters such as friction coefficients — a pytree, so whole parameter
    sweeps can be vmapped); ``q_sel`` selects the next configuration from
    ``z``; ``th_q0/th_q1/th_u`` are the theta columns of the respective
    inputs (for IFT chain rules).
    """

    nq: int
    nu: int
    nz: int
    ntheta: int
    residual: Callable
    spec: ConeSpec
    init_z: Callable
    theta_fn: Callable
    q_sel: Tuple[int, ...]
    th_q0: Tuple[int, ...]
    th_q1: Tuple[int, ...]
    th_u: Tuple[int, ...]


@dataclasses.dataclass(frozen=True)
class ImplicitDynamics:
    """Bundle of eval/grad steppers for one model.

    ``step(x, u, aux) -> y``; ``step_info`` additionally returns the
    ``IPSolution``; ``step_jac(x, u, aux) -> (y, fx, fu)`` computes the
    smoothed Jacobians with a single kappa_grad solve (the reference solves
    twice — once in ``fx`` and once in ``fu``,
    /root/reference/src/dynamics.jl:96-128; here one solve feeds both).
    """

    model: ImplicitModel
    step: Callable
    step_info: Callable
    step_jac: Callable
    step_batched: Callable      # (xs, us, aux) -> ys (lane-batched eval)
    step_jac_batched: Callable  # (xs, us, aux) -> (ys, fxs, fus)
    # warm-started lane-batched variants: z0s are solver variables from a
    # previous solve of the same timestep (the scalar solver's
    # ``dynamics_ws`` semantics; kappa_init_min keeps the central-path
    # continuation branch-consistent, docs/DESIGN.md §3)
    step_batched_ws: Callable      # (xs, us, aux, z0s) -> (ys, zs)
    step_jac_batched_ws: Callable  # (xs, us, aux, z0s) -> (ys,fxs,fus,zs)
    step_diff: Callable   # custom_vjp-wrapped step for generic autodiff
    step_carry: Callable  # (z_prev, x, u, aux) -> (y, z): warm-started
    carry_init: Callable  # (x0,) -> initial warm-start variables


def make_implicit_dynamics(
    model: ImplicitModel,
    r_tol: float = 1.0e-8,
    kappa_eval_tol: float = 1.0e-4,
    kappa_grad_tol: float = 1.0e-3,
    eval_opts: IPOptions | None = None,
    grad_opts: IPOptions | None = None,
    mehrotra: bool = False,
    fused: bool = False,
) -> ImplicitDynamics:
    nq = model.nq
    # kappa_init_min: warm-started steps (step_carry) keep a short
    # central-path continuation so they stay on the same complementarity
    # branch as cold path-following; no effect on cold starts.
    if eval_opts is None:
        eval_opts = IPOptions(r_tol=r_tol, kappa_tol=kappa_eval_tol,
                              kappa_init_min=1.0e-2, mehrotra=mehrotra)
    if grad_opts is None:
        grad_opts = IPOptions(r_tol=r_tol, kappa_tol=kappa_grad_tol,
                              kappa_init_min=1.0e-2, mehrotra=mehrotra)

    eval_solve = make_solver(model.residual, model.spec, eval_opts)
    grad_solve = make_solver(model.residual, model.spec, grad_opts)
    if fused:
        # lane-batched solves through the fused Pallas kernel (f32, TPU):
        # the whole path-following solve in one VMEM-resident kernel
        # (ops/pallas/fused_ip.py) — ~3x the XLA batched-native path
        from optimization_dynamics_tpu.ops.pallas.fused_ip import (
            make_fused_ip_solver,
        )
        grad_solve_batched = make_fused_ip_solver(
            model.residual, model.spec, grad_opts)
    else:
        grad_solve_batched = make_solver_batched(model.residual,
                                                 model.spec, grad_opts)
    sens = make_sensitivity(model.residual, model.spec)
    sens_batched = make_sensitivity_batched(model.residual, model.spec)

    q_sel = np.asarray(model.q_sel)
    th_q0 = np.asarray(model.th_q0)
    th_q1 = np.asarray(model.th_q1)
    th_u = np.asarray(model.th_u)

    def _solve(solver, x, u, aux):
        q0 = x[:nq]
        q1 = x[nq:2 * nq]
        theta = model.theta_fn(q0, q1, u, aux)
        z0 = model.init_z(q1)
        sol = solver(z0, theta)
        return sol, theta, q1

    def step_info(x, u, aux) -> Tuple[jnp.ndarray, IPSolution]:
        sol, _, q1 = _solve(eval_solve, x, u, aux)
        q2 = sol.z[q_sel]
        return jnp.concatenate([q1, q2]), sol

    def step(x, u, aux) -> jnp.ndarray:
        return step_info(x, u, aux)[0]

    def step_jac(x, u, aux):
        """One relaxed solve -> (y, dy/dx, dy/du)."""
        sol, theta, q1 = _solve(grad_solve, x, u, aux)
        q2 = sol.z[q_sel]
        y = jnp.concatenate([q1, q2])
        dz = sens(sol.z, theta)          # (nz, ntheta)
        dq = dz[q_sel, :]                # (nq, ntheta)
        dq_dq0 = dq[:, th_q0]
        dq_dq1 = dq[:, th_q1]
        dq_du = dq[:, th_u]
        eye = jnp.eye(nq, dtype=x.dtype)
        zero = jnp.zeros((nq, nq), dtype=x.dtype)
        fx = jnp.block([[zero, eye], [dq_dq0, dq_dq1]])
        fu = jnp.concatenate(
            [jnp.zeros((nq, dq_du.shape[1]), dtype=x.dtype), dq_du], axis=0)
        return y, fx, fu

    if fused:
        from optimization_dynamics_tpu.ops.pallas.fused_ip import (
            make_fused_ip_solver,
        )
        eval_solve_batched = make_fused_ip_solver(
            model.residual, model.spec, eval_opts)
    else:
        eval_solve_batched = make_solver_batched(model.residual,
                                                 model.spec, eval_opts)

    def step_batched(xs, us, aux):
        """Lane-batched eval step through the batched-native solver."""
        q0s = xs[:, :nq]
        q1s = xs[:, nq:2 * nq]
        thetas = jax.vmap(lambda q0, q1, u: model.theta_fn(q0, q1, u, aux))(
            q0s, q1s, us)
        z0s = jax.vmap(model.init_z)(q1s)
        sols = eval_solve_batched(z0s, thetas)
        return jnp.concatenate([q1s, sols.z[:, q_sel]], axis=1)

    def _jac_from_sol(xs, q1s, thetas, sols):
        q2s = sols.z[:, q_sel]
        ys = jnp.concatenate([q1s, q2s], axis=1)
        dzs = sens_batched(sols.z, thetas)
        dqs = dzs[:, q_sel, :]
        B = xs.shape[0]
        eye = jnp.broadcast_to(jnp.eye(nq, dtype=xs.dtype), (B, nq, nq))
        zero = jnp.zeros((B, nq, nq), dtype=xs.dtype)
        top = jnp.concatenate([zero, eye], axis=2)
        bot = jnp.concatenate([dqs[:, :, th_q0], dqs[:, :, th_q1]], axis=2)
        fxs = jnp.concatenate([top, bot], axis=1)
        du = dqs[:, :, th_u]
        fus = jnp.concatenate(
            [jnp.zeros((B, nq, du.shape[2]), xs.dtype), du], axis=1)
        return ys, fxs, fus

    def _thetas_of(xs, us, aux):
        q0s = xs[:, :nq]
        q1s = xs[:, nq:2 * nq]
        thetas = jax.vmap(lambda q0, q1, u: model.theta_fn(q0, q1, u, aux))(
            q0s, q1s, us)
        return q1s, thetas

    def step_jac_batched(xs, us, aux):
        """Whole-trajectory Jacobian sweep via the batched-native solver:
        one masked while_loop for all timesteps instead of
        vmap-of-while (cheaper to trace, friendlier to the compiler)."""
        q1s, thetas = _thetas_of(xs, us, aux)
        sols = grad_solve_batched(jax.vmap(model.init_z)(q1s), thetas)
        return _jac_from_sol(xs, q1s, thetas, sols)

    def step_jac_batched_ws(xs, us, aux, z0s):
        """Warm-started Jacobian sweep; also returns the solver variables
        for threading into the next sweep."""
        q1s, thetas = _thetas_of(xs, us, aux)
        sols = grad_solve_batched(z0s, thetas)
        ys, fxs, fus = _jac_from_sol(xs, q1s, thetas, sols)
        return ys, fxs, fus, sols.z

    def step_batched_ws(xs, us, aux, z0s):
        """Warm-started lane-batched eval step -> (ys, zs)."""
        q1s, thetas = _thetas_of(xs, us, aux)
        sols = eval_solve_batched(z0s, thetas)
        return jnp.concatenate([q1s, sols.z[:, q_sel]], axis=1), sols.z

    def step_carry(z_prev, x, u, aux):
        """Step warm-started from the previous timestep's solver variables
        (cuts Newton iterations ~2.4x along rollouts; the reference's
        ``Simulator`` keeps its iterate between steps the same way)."""
        q1 = x[nq:2 * nq]
        theta = model.theta_fn(x[:nq], q1, u, aux)
        sol = eval_solve(z_prev, theta)
        q2 = sol.z[q_sel]
        return jnp.concatenate([q1, q2]), sol.z

    def carry_init(x0):
        return model.init_z(x0[nq:2 * nq])

    @jax.custom_vjp
    def step_diff(x, u, aux):
        return step(x, u, aux)

    def _fwd(x, u, aux):
        y = step(x, u, aux)
        return y, (x, u, aux)

    def _bwd(res, g):
        x, u, aux = res
        _, fx, fu = step_jac(x, u, aux)
        return fx.T @ g, fu.T @ g, jax.tree_util.tree_map(
            lambda a: jnp.zeros_like(a), aux)

    step_diff.defvjp(_fwd, _bwd)

    return ImplicitDynamics(
        model=model,
        step=step,
        step_info=step_info,
        step_jac=step_jac,
        step_batched=step_batched,
        step_jac_batched=step_jac_batched,
        step_batched_ws=step_batched_ws,
        step_jac_batched_ws=step_jac_batched_ws,
        step_diff=step_diff,
        step_carry=step_carry,
        carry_init=carry_init,
    )


def simulate(dyn: ImplicitDynamics, x0: jnp.ndarray, us: jnp.ndarray,
             aux) -> Tuple[jnp.ndarray, IPSolution]:
    """Open-loop simulation collecting the full solver variables.

    The TPU equivalent of ``RoboDojo.simulate!`` with its trajectory
    buffers (q, gamma, b — SURVEY.md §2.3): returns the ``(T, 2 nq)``
    state trajectory and the stacked per-step ``IPSolution`` (whose ``z``
    rows contain configurations, contact impulses and slacks at each
    step, sliced per the model's layout).
    """

    def f(x, u):
        y, sol = dyn.step_info(x, u, aux)
        return y, (y, sol)

    _, (ys, sols) = jax.lax.scan(f, x0, us)
    xs = jnp.concatenate([x0[None], ys], axis=0)
    return xs, sols


def state_to_configuration(xs: jnp.ndarray) -> jnp.ndarray:
    """Unstack an ``(T, 2 nq)`` state trajectory into ``(T+1, nq)`` configs
    (reference: /root/reference/src/dynamics.jl:131-145)."""
    nq = xs.shape[-1] // 2
    return jnp.concatenate([xs[:1, :nq], xs[:, nq:]], axis=0)
