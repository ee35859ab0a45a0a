"""Round-5 on-chip kernel smokes, one stage per invocation (the TPU is
single-tenant and a device fault poisons the jax client — run each stage
in its own process):

  python scripts/smoke_r5_kernels.py acrobot   # nz=6 fused IP (Mosaic fix)
  python scripts/smoke_r5_kernels.py push      # nz=35 fused IP @ 32 lanes
  python scripts/smoke_r5_kernels.py roll      # whole-rollout kernel, T=51
  python scripts/smoke_r5_kernels.py rollab    # rollout kernel vs scan A/B

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/... <stage>
"""

from __future__ import annotations

import os
import sys
import time

if "scoped_vmem" not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "")
        + " --xla_tpu_scoped_vmem_limit_kib=131072").strip()

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _setup():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_default_matmul_precision", "highest")
    return jax


def stage_acrobot():
    """nz=6 fused IP kernel: the round-4 Mosaic shape-cast failure."""
    jax = _setup()
    import jax.numpy as jnp
    import numpy as np
    from optimization_dynamics_tpu.models import acrobot
    from optimization_dynamics_tpu.ops.pallas.fused_ip import (
        make_fused_ip_solver)
    from optimization_dynamics_tpu.solver.interior_point import (
        IPOptions, make_solver_batched)

    model = acrobot.impact_model()
    opts = IPOptions(r_tol=3.0e-5, kappa_tol=1.0e-3, max_iter=40,
                     max_ls=8)
    fused = make_fused_ip_solver(model.residual, model.spec, opts)
    xla = make_solver_batched(model.residual, model.spec, opts)
    aux = acrobot.AcrobotAux(h=0.05)

    B = 128
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    q1s = jnp.stack([
        jnp.pi * jax.random.normal(ks[0], (B,), jnp.float32),
        1.4 * jax.random.normal(ks[1], (B,), jnp.float32)], axis=1)
    q0s = q1s - 0.05 * jax.random.normal(ks[2], (B, 2), jnp.float32)
    us = 3.0 * jax.random.normal(ks[3], (B, 1), jnp.float32)
    thetas = jax.vmap(lambda a, b, u: model.theta_fn(a, b, u, aux))(
        q0s, q1s, us)
    z0s = jax.vmap(model.init_z)(q1s)

    t0 = time.time()
    sol_f = jax.jit(fused)(z0s, thetas)
    jax.block_until_ready(sol_f.z)
    print("acrobot fused kernel COMPILED+RAN in %.1fs" % (time.time() - t0),
          flush=True)
    sol_x = jax.jit(xla)(z0s, thetas)
    jax.block_until_ready(sol_x.z)
    cf = np.asarray(sol_f.converged)
    cx = np.asarray(sol_x.converged)
    print("acrobot cold: fused %d/%d, xla %d/%d" % (cf.sum(), B,
                                                    cx.sum(), B))
    both = cf & cx
    dq = np.abs(np.asarray(sol_f.z)[both][:, :2]
                - np.asarray(sol_x.z)[both][:, :2]).max()
    print("acrobot co-converged max |q2 diff|: %.3e" % dq)
    assert cf.sum() >= 0.9 * B, "fused convergence below gate"
    assert dq < 1e-3
    print("ACROBOT STAGE PASS", flush=True)


def stage_push():
    """nz=35 fused IP kernel at the 32-lane block (VMEM-spill fix)."""
    jax = _setup()
    import jax.numpy as jnp
    import numpy as np
    from optimization_dynamics_tpu.models import planar_push as pp
    from optimization_dynamics_tpu.ops.pallas.fused_ip import (
        make_fused_ip_solver)
    from optimization_dynamics_tpu.solver.interior_point import (
        IPOptions, make_solver_batched)

    model = pp.model()
    opts = IPOptions(r_tol=3.0e-5, kappa_tol=1.0e-3, max_iter=40,
                     max_ls=8)
    fused = make_fused_ip_solver(model.residual, model.spec, opts)
    xla = make_solver_batched(model.residual, model.spec, opts)
    aux = pp.PlanarPushAux(h=0.1)

    B = 128
    key = jax.random.PRNGKey(0)
    q = jnp.array([0.0, 0.0, 0.0, -pp.R_DIM - 1e-6, 0.0], jnp.float32)
    delta = 0.02 * jax.random.normal(key, (B, 2), jnp.float32)
    q1s = jnp.tile(q, (B, 1))
    q1s = q1s.at[:, 0:2].add(delta).at[:, 3:5].add(delta)
    q0s = q1s
    us = jnp.tile(jnp.array([1.0, 0.1], jnp.float32), (B, 1))
    thetas = jax.vmap(lambda a, b, u: model.theta_fn(a, b, u, aux))(
        q0s, q1s, us)
    z0s = jax.vmap(model.init_z)(q1s)

    t0 = time.time()
    sol_f = jax.jit(fused)(z0s, thetas)
    jax.block_until_ready(sol_f.z)
    print("push fused kernel (32 lanes) COMPILED+RAN in %.1fs"
          % (time.time() - t0), flush=True)
    sol_x = jax.jit(xla)(z0s, thetas)
    jax.block_until_ready(sol_x.z)
    cf = np.asarray(sol_f.converged)
    cx = np.asarray(sol_x.converged)
    print("push cold: fused %d/%d, xla %d/%d" % (cf.sum(), B, cx.sum(),
                                                 B))
    both = cf & cx
    if both.any():
        dq = np.abs(np.asarray(sol_f.z)[both][:, :5]
                    - np.asarray(sol_x.z)[both][:, :5]).max()
        print("push co-converged max |q2 diff|: %.3e" % dq)
        assert dq < 1e-3
    assert cf.sum() >= 0.9 * B, "fused convergence below gate"
    print("PUSH STAGE PASS", flush=True)


def _roll_setup(jax):
    import jax.numpy as jnp
    from optimization_dynamics_tpu.models import cartpole
    from optimization_dynamics_tpu.ops.pallas.fused_rollout import (
        make_fused_rollout)
    from optimization_dynamics_tpu.solver.interior_point import IPOptions

    T = 51
    model = cartpole.friction_model()
    aux = cartpole.CartpoleAux(h=0.05,
                               friction=jnp.asarray([0.35, 0.35],
                                                    jnp.float32))
    opts = IPOptions(r_tol=3.0e-5, kappa_tol=1.0e-3, max_iter=40,
                     max_ls=8)
    roll = make_fused_rollout(model, opts, aux, T)
    return T, model, aux, opts, roll


def stage_roll():
    """Whole-rollout kernel, cartpole T=51 B=128: compile + run +
    block-step timing."""
    jax = _setup()
    import jax.numpy as jnp
    import numpy as np

    T, model, aux, opts, roll = _roll_setup(jax)
    B = 128
    key = jax.random.PRNGKey(0)
    x0s = 0.01 * jax.random.normal(key, (B, 4), jnp.float32)
    us0 = jnp.zeros((B, T - 1, 1), jnp.float32).at[:, 0, 0].set(-1.5)
    z = jnp.zeros
    args = (x0s, z((B, T, 4), jnp.float32), us0,
            z((B, T - 1, 1, 4), jnp.float32), z((B, T - 1, 1),
                                                jnp.float32),
            z((B,), jnp.float32))
    rj = jax.jit(roll)
    t0 = time.time()
    xs, us, ws = rj(*args)
    jax.block_until_ready(xs)
    print("fused rollout COMPILED+RAN in %.1fs" % (time.time() - t0),
          flush=True)
    assert bool(jnp.all(jnp.isfinite(xs))), "nonfinite states"
    # steady-state timing
    n = 10
    t0 = time.time()
    for _ in range(n):
        xs, us, ws = rj(*args)
        jax.block_until_ready(xs)
    dt = (time.time() - t0) / n
    print("fused rollout: %.2f ms per (B=%d, T=%d) rollout = %.3f ms "
          "per block-step  [scan path round-4: ~0.94 ms/block-step]"
          % (1e3 * dt, B, T, 1e3 * dt / (T - 1)), flush=True)
    # quality: compare against CPU-f64? here just check the open-loop
    # trajectory is the same as the XLA scan path on-chip (stage rollab)
    print("ROLL STAGE PASS", flush=True)


def stage_rollab():
    """A/B the fused rollout vs the scan-of-steps path on-chip: same
    open-loop trajectories + wall ratio."""
    jax = _setup()
    import jax.numpy as jnp
    import numpy as np
    from optimization_dynamics_tpu.examples import cartpole as ex
    from optimization_dynamics_tpu.solver.ilqr_batched import make_phases

    B = 128
    prob_s, x0, us0, opts = ex.build_deploy_problem(True,
                                                    dtype=jnp.float32,
                                                    fused=True,
                                                    fused_rollout=False)
    prob_f, _, _, _ = ex.build_deploy_problem(True, dtype=jnp.float32,
                                              fused=True,
                                              fused_rollout=True)
    key = jax.random.PRNGKey(0)
    x0s = (jnp.tile(x0.astype(jnp.float32), (B, 1))
           + 0.01 * jax.random.normal(key, (B, 4), jnp.float32))
    us0b = jnp.broadcast_to(us0.astype(jnp.float32)[None],
                            (B,) + us0.shape)

    ph_s = make_phases(prob_s, opts, B, jnp.float32)
    ph_f = make_phases(prob_f, opts, B, jnp.float32)
    ro_s = jax.jit(ph_s.rollout_open)
    ro_f = jax.jit(ph_f.rollout_open)

    t0 = time.time()
    xs_s, ws_s = ro_s(x0s, us0b)
    jax.block_until_ready(xs_s)
    print("scan open rollout compiled+ran in %.1fs" % (time.time() - t0),
          flush=True)
    t0 = time.time()
    xs_f, ws_f = ro_f(x0s, us0b)
    jax.block_until_ready(xs_f)
    print("fused open rollout compiled+ran in %.1fs" % (time.time() - t0),
          flush=True)
    d = float(jnp.max(jnp.abs(xs_f - xs_s)))
    print("open-loop trajectory diff fused vs scan: %.3e" % d, flush=True)

    n = 10
    t0 = time.time()
    for _ in range(n):
        xs_s, _ = ro_s(x0s, us0b)
        jax.block_until_ready(xs_s)
    dt_s = (time.time() - t0) / n
    t0 = time.time()
    for _ in range(n):
        xs_f, _ = ro_f(x0s, us0b)
        jax.block_until_ready(xs_f)
    dt_f = (time.time() - t0) / n
    print("open rollout wall: scan %.1f ms, fused %.1f ms  (%.2fx)"
          % (1e3 * dt_s, 1e3 * dt_f, dt_s / dt_f), flush=True)
    assert d < 5e-3, "trajectory mismatch"
    print("ROLLAB STAGE PASS", flush=True)


if __name__ == "__main__":
    {"acrobot": stage_acrobot, "push": stage_push,
     "roll": stage_roll, "rollab": stage_rollab}[sys.argv[1]]()
