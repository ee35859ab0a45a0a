"""Fused whole-rollout kernel: parity vs the scan-of-steps path.

The kernel (ops/pallas/fused_rollout.py) must reproduce the
closed-loop rollout semantics of ``ilqr_batched.closed_loop`` under the
deploy policy (cold per-step init_z warm starts): same trajectories,
same controls, same per-step solver variables — it moves the glue into
the kernel, not the math. Interpret mode on CPU; the real-chip check is
bench.py / the fault ladder.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimization_dynamics_tpu.dynamics import make_implicit_dynamics
from optimization_dynamics_tpu.models import cartpole
from optimization_dynamics_tpu.ops.pallas.fused_ip import (
    make_fused_ip_solver,
)
from optimization_dynamics_tpu.ops.pallas.fused_rollout import (
    make_fused_rollout,
)
from optimization_dynamics_tpu.solver.interior_point import IPOptions

T = 6
B = 4
NQ, NU = cartpole.NQ, cartpole.NU
NX = 2 * NQ
OPTS = IPOptions(r_tol=3.0e-5, kappa_tol=1.0e-3, max_iter=40, max_ls=8)


@pytest.fixture(scope="module")
def setup():
    model = cartpole.friction_model()
    aux = cartpole.CartpoleAux(
        h=0.05, friction=jnp.asarray([0.35, 0.35], jnp.float32))
    fused = make_fused_rollout(model, OPTS, aux, T, interpret=True)
    # reference: scan of per-step solves through the SAME fused-IP math
    # (interpret mode), feedback control in plain XLA
    solver = make_fused_ip_solver(model.residual, model.spec, OPTS,
                                  interpret=True)
    q_sel = np.asarray(model.q_sel)

    def ref_rollout(x0s, xss_ref, uss_ref, Kss, kss, alphas):
        def step(x, inp):
            xr, ur, Kt, kt = inp
            u = (ur + alphas[:, None] * kt
                 + jnp.einsum("bij,bj->bi", Kt, x - xr))
            q0, q1 = x[:, :NQ], x[:, NQ:]
            thetas = jax.vmap(
                lambda a, b, c: model.theta_fn(a, b, c, aux))(q0, q1, u)
            sol = solver(jax.vmap(model.init_z)(q1), thetas)
            y = jnp.concatenate([q1, sol.z[:, q_sel]], axis=1)
            return y, (y, u, sol.z)

        sw = lambda a: jnp.swapaxes(a, 0, 1)
        _, (ys, us, zs) = jax.lax.scan(
            step, x0s, (sw(xss_ref[:, :-1]), sw(uss_ref), sw(Kss),
                        sw(kss)))
        xss = jnp.concatenate([x0s[:, None], sw(ys)], axis=1)
        return xss, sw(us), sw(zs)

    rng = np.random.RandomState(0)
    x0s = jnp.asarray(0.1 * rng.randn(B, NX), jnp.float32)
    uss = jnp.asarray(0.5 * rng.randn(B, T - 1, NU), jnp.float32)
    xss_ref = jnp.asarray(0.1 * rng.randn(B, T, NX), jnp.float32)
    Kss = jnp.asarray(0.1 * rng.randn(B, T - 1, NU, NX), jnp.float32)
    kss = jnp.asarray(0.2 * rng.randn(B, T - 1, NU), jnp.float32)
    alphas = jnp.asarray(rng.rand(B), jnp.float32)
    return fused, ref_rollout, (x0s, xss_ref, uss, Kss, kss, alphas)


def test_closed_loop_parity(setup):
    fused, ref, args = setup
    x0s, xss_ref, uss, Kss, kss, alphas = args
    xs_f, us_f, ws_f = fused(x0s, xss_ref, uss, Kss, kss, alphas)
    xs_r, us_r, ws_r = ref(x0s, xss_ref, uss, Kss, kss, alphas)
    assert xs_f.shape == (B, T, NX)
    assert us_f.shape == (B, T - 1, NU)
    np.testing.assert_allclose(np.asarray(us_f), np.asarray(us_r),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(xs_f), np.asarray(xs_r),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(ws_f), np.asarray(ws_r),
                               atol=5e-3)


def test_open_loop_is_zero_gain_case(setup):
    fused, ref, args = setup
    x0s, xss_ref, uss, _, _, _ = args
    z = jnp.zeros
    xs_f, us_f, _ = fused(x0s, z((B, T, NX), jnp.float32), uss,
                          z((B, T - 1, NU, NX), jnp.float32),
                          z((B, T - 1, NU), jnp.float32),
                          z((B,), jnp.float32))
    # controls pass through untouched; trajectory matches the reference
    # open-loop scan
    np.testing.assert_allclose(np.asarray(us_f), np.asarray(uss),
                               atol=1e-6)
    xs_r, _, _ = ref(x0s, z((B, T, NX), jnp.float32), uss,
                     z((B, T - 1, NU, NX), jnp.float32),
                     z((B, T - 1, NU), jnp.float32),
                     z((B,), jnp.float32))
    np.testing.assert_allclose(np.asarray(xs_f), np.asarray(xs_r),
                               atol=2e-4)


def test_u_mask_folding(setup):
    """A masked-out control column never deviates from u_ref."""
    model = cartpole.friction_model()
    aux = cartpole.CartpoleAux(
        h=0.05, friction=jnp.asarray([0.35, 0.35], jnp.float32))
    mask = np.ones((T - 1, NU), bool)
    mask[2] = False
    fused_m = make_fused_rollout(model, OPTS, aux, T, u_mask=mask,
                                 interpret=True)
    _, _, args = setup
    x0s, xss_ref, uss, Kss, kss, alphas = args
    _, us_f, _ = fused_m(x0s, xss_ref, uss, Kss, kss, alphas)
    np.testing.assert_allclose(np.asarray(us_f[:, 2]),
                               np.asarray(uss[:, 2]), atol=1e-6)
    assert float(jnp.max(jnp.abs(us_f[:, 1] - uss[:, 1]))) > 1e-4


def test_phases_integration():
    """make_phases with rollout_fused: cascade line search produces the
    same accepted trajectories as the scan path (cold policy). Runs with
    x64 disabled — the deploy tier is f32 and the fused kernel pipeline
    is f32 by design."""
    with jax.enable_x64(False):
        _phases_integration_body()


def _phases_integration_body():
    from optimization_dynamics_tpu.solver.ilqr import (
        ILQROptions, ILQRProblem)
    from optimization_dynamics_tpu.solver.ilqr_batched import make_phases

    model = cartpole.friction_model()
    aux = cartpole.CartpoleAux(
        h=0.05, friction=jnp.asarray([0.35, 0.35], jnp.float32))
    dyn = make_implicit_dynamics(model, eval_opts=OPTS, grad_opts=OPTS)
    xT = jnp.array([0.0, jnp.pi, 0.0, jnp.pi], jnp.float32)
    base = ILQRProblem(
        T=T, nx=NX, nu=NU, ncon=0, nconT=NX,
        dynamics=lambda t, x, u: dyn.step(x, u, aux),
        dynamics_jac=lambda t, x, u: dyn.step_jac(x, u, aux),
        dynamics_jac_batched=lambda ts, xs, us: dyn.step_jac_batched(
            xs, us, aux),
        dynamics_batched=lambda t, xs, us: dyn.step_batched(xs, us, aux),
        dynamics_batched_ws=lambda t, xs, us, ws: dyn.step_batched_ws(
            xs, us, aux, ws),
        dynamics_jac_batched_ws=lambda ts, xs, us, wss:
            dyn.step_jac_batched_ws(xs, us, aux, wss),
        ws_init_batched=lambda t, xs, us: jax.vmap(dyn.carry_init)(xs),
        ws_linesearch=False,
        stage_cost=lambda t, x, u: jnp.sum(u * u),
        terminal_cost=lambda x: jnp.sum((x - xT) ** 2),
        terminal_con=lambda x: x - xT,
    )
    fused_roll = make_fused_rollout(model, OPTS, aux, T, interpret=True)
    prob_f = base._replace(rollout_fused=fused_roll)
    opts = ILQROptions(alpha_min=1e-2, max_iter=3, max_al_iter=2,
                       con_tol=0.01, rho_max=1e6)

    rng = np.random.RandomState(1)
    x0s = jnp.asarray(0.05 * rng.randn(B, NX), jnp.float32)
    us0 = jnp.asarray(0.1 * rng.randn(B, T - 1, NU), jnp.float32)

    ph_s = make_phases(base, opts, B, jnp.float32)
    ph_f = make_phases(prob_f, opts, B, jnp.float32)

    xss_s, wss_s = ph_s.rollout_open(x0s, us0)
    xss_f, wss_f = ph_f.rollout_open(x0s, us0)
    np.testing.assert_allclose(np.asarray(xss_f), np.asarray(xss_s),
                               atol=2e-4)

    lams = jnp.zeros((B, T - 1, 1), jnp.float32)
    lamTs = jnp.zeros((B, NX), jnp.float32)
    rhos = jnp.ones(B, jnp.float32)
    regs = jnp.full(B, 1e-6, jnp.float32)
    active = jnp.ones(B, bool)
    Js_s = ph_s.traj_cost(xss_s, us0, lams, lamTs, rhos)
    out_s = ph_s.inner_step(xss_s, us0, Js_s, regs, lams, lamTs, rhos,
                            active, wss_s)
    out_f = ph_f.inner_step(xss_f, us0, Js_s, regs, lams, lamTs, rhos,
                            active, wss_f)
    # accepted trajectories agree (IP solves are identical math; the
    # feedback/glue reassociates at f32 epsilon and compounds over T)
    np.testing.assert_allclose(np.asarray(out_f[0]),
                               np.asarray(out_s[0]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(out_f[2]),
                               np.asarray(out_s[2]), rtol=1e-3)
