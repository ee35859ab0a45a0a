"""Probe candidate dryrun_multichip configs for wall-time fit.

Usage: python scripts/dryrun_probe.py <variant> [n_devices]
Variants: cartpole_easy | cartpole_hard | acrobot | cartpole_deploy
Prints one line: variant, wall seconds (compile+run split), converged.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time


def main():
    variant = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from optimization_dynamics_tpu.solver.ilqr_batched import solve_batched

    t_begin = time.perf_counter()
    if variant.startswith("cartpole"):
        import bench
        prob, x0, us0, opts = bench._build(on_tpu=False, dtype=jnp.float64)
        if variant == "cartpole_easy":
            # rebuild with light friction
            from optimization_dynamics_tpu.examples import cartpole as ex
            from optimization_dynamics_tpu.models import cartpole
            from optimization_dynamics_tpu.dynamics import (
                make_implicit_dynamics)
            from optimization_dynamics_tpu.solver.interior_point import (
                IPOptions)
            model = cartpole.friction_model()
            aux = cartpole.CartpoleAux(
                h=ex.H, friction=jnp.asarray([0.1, 0.1], jnp.float64))
            ip = dict(r_tol=1.0e-8, kappa_tol=1.0e-3, max_iter=40,
                      max_ls=8)
            dyn = make_implicit_dynamics(
                model, eval_opts=IPOptions(**ip), grad_opts=IPOptions(**ip))
            prob = prob._replace(
                dynamics=lambda t, x, u: dyn.step(x, u, aux),
                dynamics_jac=lambda t, x, u: dyn.step_jac(x, u, aux),
                dynamics_jac_batched=lambda ts, xs, us:
                    dyn.step_jac_batched(xs, us, aux),
                dynamics_batched=lambda t, xs, us: dyn.step_batched(
                    xs, us, aux),
                dynamics_batched_ws=lambda t, xs, us, ws:
                    dyn.step_batched_ws(xs, us, aux, ws),
                dynamics_jac_batched_ws=lambda ts, xs, us, wss:
                    dyn.step_jac_batched_ws(xs, us, aux, wss),
                ws_init_batched=lambda t, xs, us: jax.vmap(dyn.carry_init)(
                    xs),
                ws_linesearch=False)
        nxp = 4
    elif variant == "acrobot":
        from optimization_dynamics_tpu.examples import acrobot as ex
        prob, x0, us0, opts = ex.build_problem("impact")
        nxp = 4
    else:
        raise SystemExit("unknown variant " + variant)

    devices = jax.devices()[:n]
    mesh = Mesh(np.asarray(devices), ("scenario",))
    sharding = NamedSharding(mesh, PartitionSpec("scenario"))
    B = n
    rng = np.random.RandomState(0)
    x0s = jax.device_put(
        jnp.asarray(np.tile(np.asarray(x0), (B, 1))
                    + 0.01 * rng.randn(B, nxp)), sharding)

    step = jax.jit(lambda xs: solve_batched(prob, xs, us0, opts))
    t0 = time.perf_counter()
    lowered = step.lower(x0s).compile()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = lowered(x0s)
    jax.block_until_ready(res.xs)
    t_run = time.perf_counter() - t0
    n_conv = int(jnp.sum(res.converged))
    print(f"PROBE {variant} n={n} B={B} compile={t_compile:.1f}s "
          f"run={t_run:.1f}s total={time.perf_counter() - t_begin:.1f}s "
          f"converged={n_conv}/{B} "
          f"maxvio={float(jnp.max(res.constraint_violation)):.2e}",
          flush=True)


if __name__ == "__main__":
    main()
