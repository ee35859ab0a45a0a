"""CPU repro of the round-1 TPU f32 convergence collapse (VERDICT #1).

Round-1 BENCH ran the segmented executor at the bench config and
converged 1/64 lanes. This script reproduces the bench configuration on
CPU (f32 by default, x64 off) so the failure can be bisected without the
chip. Ablation axes:

  --f64            run in f64 (x64 on) instead of f32
  --no-ws          drop the same-timestep warm-start plumbing
                   (dynamics_batched_ws) that bench.py adds
  --kim KIM        IPOptions.kappa_init_min (bench omitted it -> 0.0;
                   the library default wiring uses 1e-2)
  --kappa-eval K   eval-solver kappa_tol (bench: 1e-3; reference: 1e-4)
  --B N            batch width (default 16)
  --solver S       segmented | batched

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/repro_f32.py
"""

from __future__ import annotations

import argparse
import dataclasses
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--f64", action="store_true")
    p.add_argument("--no-ws", action="store_true")
    p.add_argument("--ws-jac-only", action="store_true",
                   help="warm-start only the derivative sweep (re-solves "
                        "the accepted trajectory: benign) and keep "
                        "line-search rollouts cold")
    p.add_argument("--ws-carry", action="store_true",
                   help="with --ws-jac-only: additionally thread each "
                        "rollout's previous-TIMESTEP solver variables as "
                        "warm starts (same-trajectory carry; branch-safe "
                        "per docs/DESIGN.md §3, measured here)")
    p.add_argument("--kim", type=float, default=0.0)
    p.add_argument("--mehrotra-grad", action="store_true",
                   help="Mehrotra predictor-corrector in the derivative "
                        "sweep only (re-solves the accepted trajectory: "
                        "branch-safe by construction, DESIGN.md §3)")
    p.add_argument("--mehrotra-eval", action="store_true",
                   help="Mehrotra in the eval/rollout solver too "
                        "(branch-selection risk on the knife edge)")
    p.add_argument("--kappa-eval", type=float, default=1.0e-3)
    p.add_argument("--kappa-grad", type=float, default=1.0e-3)
    p.add_argument("--r-tol", type=float, default=3.0e-5)
    p.add_argument("--B", type=int, default=16)
    p.add_argument("--rho-max", type=float, default=1.0e6)
    p.add_argument("--solver", default="segmented",
                   choices=["segmented", "batched"])
    p.add_argument("--no-compact", action="store_true",
                   help="disable active-lane batch compaction")
    p.add_argument("--compact-min", type=int, default=8,
                   help="smallest compaction bucket width")
    p.add_argument("--stall-rounds", type=int, default=0,
                   help="al_stall_rounds straggler policy (bench: 2)")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", bool(args.f64))
    import jax.numpy as jnp

    from optimization_dynamics_tpu.dynamics import make_implicit_dynamics
    from optimization_dynamics_tpu.examples import cartpole as ex
    from optimization_dynamics_tpu.models import cartpole
    from optimization_dynamics_tpu.solver.interior_point import IPOptions

    dtype = jnp.float64 if args.f64 else jnp.float32
    prob, x0, us0, opts = ex.build_problem("friction", dtype=dtype)
    model = cartpole.friction_model()
    aux = cartpole.CartpoleAux(h=ex.H,
                               friction=jnp.asarray([0.35, 0.35], dtype))
    dyn = make_implicit_dynamics(
        model,
        eval_opts=IPOptions(r_tol=args.r_tol, kappa_tol=args.kappa_eval,
                            max_iter=40, max_ls=8,
                            kappa_init_min=args.kim,
                            mehrotra=args.mehrotra_eval),
        grad_opts=IPOptions(r_tol=args.r_tol, kappa_tol=args.kappa_grad,
                            max_iter=40, max_ls=8,
                            kappa_init_min=args.kim,
                            mehrotra=args.mehrotra_grad))
    prob = prob._replace(
        dynamics=lambda t, x, u: dyn.step(x, u, aux),
        dynamics_jac=lambda t, x, u: dyn.step_jac(x, u, aux),
        dynamics_jac_batched=lambda ts, xs, us: dyn.step_jac_batched(
            xs, us, aux),
        dynamics_batched=lambda t, xs, us: dyn.step_batched(xs, us, aux),
        dynamics_carry=lambda t, x, u, z: dyn.step_carry(z, x, u, aux),
        carry_init=dyn.carry_init)
    if not args.no_ws:
        prob = prob._replace(
            dynamics_batched_ws=lambda t, xs, us, ws: dyn.step_batched_ws(
                xs, us, aux, ws),
            dynamics_jac_batched_ws=lambda ts, xs, us, wss:
                dyn.step_jac_batched_ws(xs, us, aux, wss),
            ws_init_batched=lambda t, xs, us: jax.vmap(dyn.carry_init)(xs),
            ws_linesearch=not args.ws_jac_only,
            ws_carry=args.ws_carry)
    opts = dataclasses.replace(opts, con_tol=0.01, rho_max=args.rho_max,
                               alpha_min=1.0e-2)

    B = args.B
    key = jax.random.PRNGKey(0)
    x0s = (jnp.tile(x0.astype(dtype), (B, 1))
           + 0.01 * jax.random.normal(key, (B, 4), dtype))

    t0 = time.perf_counter()
    if args.solver == "segmented":
        from optimization_dynamics_tpu.solver.ilqr_segmented import (
            make_segmented_solver)
        run = make_segmented_solver(prob, opts, B, dtype=dtype,
                                    compact=not args.no_compact,
                                    compact_min=args.compact_min,
                                    al_stall_rounds=args.stall_rounds,
                                    log=lambda s: print(s, flush=True))
        res = run(x0s, us0.astype(dtype))
    else:
        from optimization_dynamics_tpu.solver.ilqr_batched import (
            solve_batched)
        run = jax.jit(lambda xs: solve_batched(prob, xs,
                                               us0.astype(dtype), opts))
        res = run(x0s)
    jax.block_until_ready(res.xs)
    dt = time.perf_counter() - t0

    import numpy as np
    conv = np.asarray(res.converged)
    obj = np.asarray(res.objective)
    vio = np.asarray(res.constraint_violation)
    print("converged %d/%d  wall %.1fs" % (conv.sum(), B, dt))
    print("objectives:", np.array2string(obj, precision=2))
    print("violations:", np.array2string(vio, precision=3))


if __name__ == "__main__":
    main()
