"""Fused Pallas IP kernel vs the batched-native solver (interpret mode).

The kernel must reproduce make_solver_batched exactly (same schedule,
same line-search pick): identical iteration counts and f32-roundoff-equal
solutions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimization_dynamics_tpu.models import acrobot, cartpole
from optimization_dynamics_tpu.ops.pallas.fused_ip import (
    make_fused_ip_solver,
)
from optimization_dynamics_tpu.solver.interior_point import (
    IPOptions,
    make_solver_batched,
)

OPTS = IPOptions(r_tol=3e-5, kappa_tol=1e-3, max_iter=40, max_ls=8,
                 kappa_init_min=1e-2)


def _batch(model, aux, B=16, seed=0):
    nq = model.nq
    q0 = 0.2 * jax.random.normal(jax.random.PRNGKey(seed), (B, nq),
                                 jnp.float32)
    q1 = q0 + 0.02 * jax.random.normal(jax.random.PRNGKey(seed + 1),
                                       (B, nq), jnp.float32)
    u = 0.5 * jax.random.normal(jax.random.PRNGKey(seed + 2),
                                (B, model.nu), jnp.float32)
    thetas = jax.vmap(lambda a, b, c: model.theta_fn(a, b, c, aux))(
        q0, q1, u)
    z0s = jax.vmap(model.init_z)(q1)
    return z0s, thetas


@pytest.mark.parametrize("name", ["cartpole", "acrobot"])
def test_fused_matches_batched(name):
    if name == "cartpole":
        model = cartpole.friction_model()
        aux = cartpole.CartpoleAux(
            h=0.05, friction=jnp.asarray([0.35, 0.35], jnp.float32))
    else:
        model = acrobot.impact_model()
        aux = acrobot.AcrobotAux(h=jnp.float32(0.05))
    z0s, thetas = _batch(model, aux)
    # reference in f64 (the batched solver promotes under the x64 test
    # config); the fused kernel is f32 by design -> tolerance compare
    ref = make_solver_batched(model.residual, model.spec, OPTS)(
        z0s.astype(jnp.float64), thetas.astype(jnp.float64))
    fus = make_fused_ip_solver(model.residual, model.spec, OPTS,
                               interpret=True)(z0s, thetas)
    assert int(jnp.sum(fus.converged)) == int(jnp.sum(ref.converged))
    both = np.asarray(ref.converged) & np.asarray(fus.converged)
    nq = model.nq
    np.testing.assert_allclose(np.asarray(fus.z)[both][:, :nq],
                               np.asarray(ref.z)[both][:, :nq], atol=1e-4)


def _nominal_batch(model, q_nom, u_nom, aux, B=8, dq=0.005, du=0.1, seed=3):
    """Perturbations around a physically sensible configuration (contact
    models need interior-reachable states, unlike the random _batch)."""
    k = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(k, 3)
    q0 = q_nom + dq * jax.random.normal(k1, (B, model.nq), jnp.float32)
    q1 = q0 + dq * 0.2 * jax.random.normal(k2, (B, model.nq), jnp.float32)
    u = u_nom + du * jax.random.normal(k3, (B, model.nu), jnp.float32)
    thetas = jax.vmap(lambda a, b, c: model.theta_fn(a, b, c, aux))(
        q0, q1, u)
    z0s = jax.vmap(model.init_z)(q1)
    return z0s, thetas


@pytest.mark.parametrize("name", ["planar_push", "hopper"])
def test_fused_matches_batched_hard_models(name):
    """The fused kernel on the hardest cone geometries: planar push
    (nz=35, orthant + 4x SOC(3) + SOC(2)) and hopper (nz=20, RoboDojo
    contact structure)."""
    from optimization_dynamics_tpu.models import hopper, planar_push

    if name == "planar_push":
        model = planar_push.model()
        aux = planar_push.PlanarPushAux(h=jnp.float32(0.1))
        q_nom = jnp.array([0.0, 0.0, 0.0, -planar_push.R_DIM - 1e-6, 0.0],
                          jnp.float32)
        u_nom = jnp.array([1.0, 0.1], jnp.float32)
    else:
        model = hopper.model()
        aux = hopper.HopperAux(
            h=jnp.float32(0.05),
            friction=jnp.asarray([0.5, 0.5], jnp.float32))
        q_nom = jnp.array([0.0, 0.5 + hopper.HopperParams().foot_radius,
                           0.0, 0.5], jnp.float32)
        u_nom = jnp.zeros((2,), jnp.float32)
    z0s, thetas = _nominal_batch(model, q_nom, u_nom, aux)
    ref = make_solver_batched(model.residual, model.spec, OPTS)(
        z0s.astype(jnp.float64), thetas.astype(jnp.float64))
    fus = make_fused_ip_solver(model.residual, model.spec, OPTS,
                               interpret=True)(z0s, thetas)
    # all but at most one reference-converged lane (f32 kernel vs f64
    # reference on knife-edge states) must also converge fused, to the
    # same configuration
    both = np.asarray(ref.converged) & np.asarray(fus.converged)
    assert both.sum() >= int(np.asarray(ref.converged).sum()) - 1
    assert both.sum() >= 6
    nq = model.nq
    np.testing.assert_allclose(np.asarray(fus.z)[both][:, :nq],
                               np.asarray(ref.z)[both][:, :nq],
                               atol=2e-4)


def test_fused_rocket_projection():
    """Thrust-cone SOC projection (nz=10, SOC(3) + 2 orthant pairs) through
    the fused kernel: projected thrusts must be cone-feasible and match
    the batched-native solve."""
    from optimization_dynamics_tpu.models import rocket

    B = 16
    u_bar = 6.0 * jax.random.normal(jax.random.PRNGKey(7), (B, 3),
                                    jnp.float32)
    u_max = jnp.full((B, 1), 12.5, jnp.float32)
    thetas = jnp.concatenate([u_bar, u_max], axis=1)
    z0s = jnp.tile(rocket.init_z_proj(jnp.float32), (B, 1))
    spec = rocket.cone_spec_proj()
    opts = OPTS
    ref = make_solver_batched(rocket.residual_proj, spec, opts)(
        z0s.astype(jnp.float64), thetas.astype(jnp.float64))
    fus = make_fused_ip_solver(rocket.residual_proj, spec, opts,
                               interpret=True)(z0s, thetas)
    both = np.asarray(ref.converged) & np.asarray(fus.converged)
    assert both.sum() >= 14
    u = np.asarray(fus.z)[both][:, 0:3]
    assert (np.linalg.norm(u[:, 0:2], axis=1) <= u[:, 2] + 1e-4).all()
    np.testing.assert_allclose(u, np.asarray(ref.z)[both][:, 0:3],
                               atol=2e-4)


def test_fused_pads_ragged_batch():
    model = acrobot.impact_model()
    aux = acrobot.AcrobotAux(h=jnp.float32(0.05))
    z0s, thetas = _batch(model, aux, B=5)
    sol = make_fused_ip_solver(model.residual, model.spec, OPTS,
                               interpret=True)(z0s, thetas)
    assert sol.z.shape == (5, model.nz)
    assert bool(jnp.all(sol.converged))


def test_fused_matches_xla_on_swingup_envelope():
    """Bench-distribution parity (round-2 diag): states spanning the
    swing-up envelope (|q| up to ~2, angles +-pi, u +-3sigma) — cold
    solves must agree between the fused kernel and the XLA path at the
    TPU bench tolerances."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from optimization_dynamics_tpu.models import cartpole
    from optimization_dynamics_tpu.ops.pallas.fused_ip import (
        make_fused_ip_solver)
    from optimization_dynamics_tpu.solver.interior_point import (
        IPOptions, make_solver_batched)

    model = cartpole.friction_model()
    opts = IPOptions(r_tol=3.0e-5, kappa_tol=1.0e-3, max_iter=40,
                     max_ls=8)
    fused = make_fused_ip_solver(model.residual, model.spec, opts,
                                 interpret=True)
    xla = make_solver_batched(model.residual, model.spec, opts)
    aux = cartpole.CartpoleAux(
        h=0.05, friction=jnp.asarray([0.35, 0.35], jnp.float32))
    B = 32
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q1s = jnp.stack([
        2.0 * jax.random.normal(ks[0], (B,), jnp.float32),
        jnp.pi * jax.random.normal(ks[1], (B,), jnp.float32)], axis=1)
    q0s = q1s - 0.05 * jax.random.normal(ks[2], (B, 2), jnp.float32)
    us = 3.0 * jax.random.normal(ks[3], (B, 1), jnp.float32)
    thetas = jax.vmap(lambda q0, q1, u: model.theta_fn(q0, q1, u, aux))(
        q0s, q1s, us)
    z0s = jax.vmap(model.init_z)(q1s)
    sf = fused(z0s, thetas)
    # f64 XLA reference (the f32 XLA loop promotes under the x64 test
    # env; the CPU-f32 comparison lives in scripts/diag_fused_tpu.py)
    sx = jax.jit(xla)(z0s.astype(jnp.float64), thetas.astype(jnp.float64))
    cf, cx = np.asarray(sf.converged), np.asarray(sx.converged)
    assert cf.sum() >= cx.sum() - 1, (cf.sum(), cx.sum())
    both = cf & cx
    assert both.any()
    dq = np.abs(np.asarray(sf.z)[both][:, :2]
                - np.asarray(sx.z)[both][:, :2]).max()
    assert dq < 1e-4, dq
