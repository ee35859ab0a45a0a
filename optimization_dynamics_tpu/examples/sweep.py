"""Production-style scenario sweep: thousands of contact-implicit solves
sharded over the device mesh.

Demonstrates the scale-out path (SURVEY.md §2.5): a grid of (friction
coefficient, initial state) cartpole swing-up scenarios is vmapped per
chip and sharded across all devices; shards stream through the
checkpointer so preempted sweeps resume; convergence statistics aggregate
across the mesh. Multi-host: run under ``jax.distributed.initialize()``
with no code changes.

Usage: python -m optimization_dynamics_tpu.examples.sweep [n_scenarios]
"""

from __future__ import annotations

import os
import sys
import time

# XLA fusions around the fused Pallas IP kernel exceed the 16 MB
# default scoped-vmem budget; the TPU-only flag must travel via
# LIBTPU_INIT_ARGS (unknown XLA_FLAGS abort this backend's parser) and
# must be set before first backend use (same preamble as bench.py).
if "scoped_vmem" not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "")
        + " --xla_tpu_scoped_vmem_limit_kib=131072").strip()

import jax
import jax.numpy as jnp
import numpy as np

from optimization_dynamics_tpu.dynamics import make_implicit_dynamics
from optimization_dynamics_tpu.models import cartpole
from optimization_dynamics_tpu.parallel.mesh import (
    convergence_summary,
    merge_retry,
    quarantine,
    scenario_mesh,
    shard_scenarios,
)
from optimization_dynamics_tpu.solver.ilqr import (
    ILQROptions,
    ILQRProblem,
    solve,
)
from optimization_dynamics_tpu.utils.checkpoint import SweepCheckpointer

H, T = 0.05, 51


def make_solver(dtype=jnp.float64):
    """One scenario = (friction pair, initial state) -> full AL-iLQR solve.

    Friction travels through theta, so it is a vmappable input.
    """
    dyn = make_implicit_dynamics(
        cartpole.friction_model(),
        kappa_eval_tol=1.0e-4, kappa_grad_tol=1.0e-3)
    xT = jnp.array([0.0, jnp.pi, 0.0, jnp.pi], dtype)

    def solve_one(friction, x0):
        aux = cartpole.CartpoleAux(h=H, friction=friction)
        prob = ILQRProblem(
            T=T, nx=4, nu=1, ncon=0, nconT=4,
            dynamics=lambda t, x, u: dyn.step(x, u, aux),
            dynamics_jac=lambda t, x, u: dyn.step_jac(x, u, aux),
            stage_cost=lambda t, x, u: u @ u,
            terminal_cost=lambda x: (x - xT) @ (x - xT),
            terminal_con=lambda x: x - xT,
            # ws only: adding the open-loop carry variant too doubles the
            # number of traced solver-body copies and compile time
            dynamics_ws=lambda t, x, u, z: dyn.step_carry(z, x, u, aux),
            ws_init=lambda t, x, u: dyn.carry_init(x),
        )
        opts = ILQROptions(max_iter=100, max_al_iter=20, con_tol=0.005)
        us0 = jnp.zeros((T - 1, 1), dtype).at[0, 0].set(-1.5)
        return solve(prob, x0, us0, opts)

    return solve_one


def run_sweep(n_scenarios: int = 64, shard_size: int = 32,
              out_dir: str = "runs/cartpole_sweep", dtype=jnp.float64):
    mesh = scenario_mesh()
    solve_one = make_solver(dtype)
    run = jax.jit(jax.vmap(solve_one))
    ck = SweepCheckpointer(out_dir)

    key = jax.random.PRNGKey(0)
    frictions = jnp.linspace(0.05, 0.4, n_scenarios)[:, None].repeat(2, 1)
    x0s = 0.02 * jax.random.normal(key, (n_scenarios, 4), dtype)

    n_shards = (n_scenarios + shard_size - 1) // shard_size
    stats = []
    for s in range(n_shards):
        if ck.done(s):
            continue
        sl = slice(s * shard_size, (s + 1) * shard_size)
        fr = shard_scenarios(mesh, frictions[sl].astype(dtype))
        x0 = shard_scenarios(mesh, x0s[sl])
        t0 = time.time()
        res = run(fr, x0)
        jax.block_until_ready(res.xs)
        failed = quarantine(res.converged)
        if failed:
            # quarantine + random-restart pass: re-solve the whole shard
            # from perturbed initial states (same shapes -> no recompile)
            # and keep retry results only on the failed lanes.
            key_r = jax.random.fold_in(key, 1000 + s)
            x0_r = x0 + 0.05 * jax.random.normal(key_r, x0.shape, dtype)
            res_r = run(fr, x0_r)
            jax.block_until_ready(res_r.xs)
            res = merge_retry(res, res_r)
        wall = time.time() - t0
        summary = convergence_summary(res.converged, res.iterations)
        summary["retried"] = len(failed)
        summary["wall_s"] = round(wall, 3)
        summary["solves_per_s"] = round(fr.shape[0] / wall, 2)
        ck.save(s, res, meta=summary)
        stats.append(summary)
        print(f"shard {s}: {summary}", flush=True)
    return stats


def run_sweep_deploy(n_scenarios: int = 256, shard: int = 128,
                     warm: bool = False,
                     out_dir: str | None = None, verbose: bool = True):
    """Deploy-tier sweep with PROBLEM-LEVEL warm starts (VERDICT r3 #3
    and #7): the f32 segmented+fused flagship configuration that
    bench.py measures (``cartpole.build_deploy_problem``), run shard by
    shard over a scenario grid where lane i of shard s+1 is the
    nearest neighbor of lane i of shard s (a ray of growing
    initial-state perturbations at the knife-edge friction 0.35).

    ``warm=True`` seeds each shard's controls AND augmented-Lagrangian
    duals from its neighbor's converged solution; the penalty restarts
    at ``rho_init`` so the AL loop re-verifies feasibility.

    MEASURED A/B (round 4, on-chip, 256 scenarios — logs/
    sweep_{warm,cold}_r4.log): on THIS problem (knife-edge friction-
    0.35 swing-up) neighbor warm starts are actively HARMFUL — the
    warm arm converged 95/128 in 170 s where the cold arm converged
    125/128 in 131 s on the identical shard. The open-loop rollout of
    a neighbor's bang-bang controls from a different initial state
    diverges (chaotic swing-up dynamics), and the stale duals then
    pull toward the neighbor's basin. Warm starts DO pay on stable
    regulation problems (tests/test_ilqr_segmented.py::
    test_warm_start_from_neighbor_solution pins the iteration win), so
    the mechanism stays; the deploy sweep default is COLD
    (``--warm`` opt-in).

    Returns the per-shard summary list (wall, converged count, mean
    inner iterations, measured IP solves) — the warm-vs-cold A/B
    artifact for BASELINE.md."""
    from optimization_dynamics_tpu.examples import cartpole as excp
    from optimization_dynamics_tpu.solver.ilqr_segmented import (
        make_segmented_solver)

    # deploy-tier numerics (bench._setup_jax): full-f32 matmuls — the
    # default bf16 multiplicands collapse convergence on the knife-edge
    # friction-0.35 swing-up (measured here: 1/128 lanes converged with
    # the default vs 120/128 at "highest"; docs/DESIGN.md §4) — and the
    # persistent compile cache so repeat sweeps start hot
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:
        pass
    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.float32 if on_tpu else jnp.float64
    if not on_tpu:
        shard = min(shard, 8)        # CPU tier: keep lockstep width sane
    prob, x0, us0, opts = excp.build_deploy_problem(on_tpu, dtype=dtype)
    # the round-4 bench-winning deploy policy: slice cascade + per-AL-
    # round inner budgets + straggler drop (logs/bench_r4_alsched_run1;
    # per-iteration solver logging stays off — it costs a device sync)
    run = make_segmented_solver(prob, opts, shard, dtype=dtype,
                                max_iter_schedule=[15, 15, 25, 25, 30],
                                al_stall_rounds=2)
    ck = SweepCheckpointer(out_dir) if out_dir else None

    n_shards = (n_scenarios + shard - 1) // shard
    # fixed per-lane perturbation directions; shard s sits at magnitude
    # (s+1)*step along its lane's ray -> lane i of consecutive shards
    # are nearest neighbors in scenario space
    dirs = np.array(jax.random.normal(jax.random.PRNGKey(0),
                                      (shard, 4)))  # writable copy
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    step_mag = 0.02

    prev = None
    stats = []
    for s in range(n_shards):
        x0s = jnp.asarray(np.asarray(x0)[None]
                          + (s + 1) * step_mag * dirs, dtype)
        if warm and prev is not None:
            us_init, lam_i, lamT_i = prev.us, prev.lam, prev.lamT
        else:
            us_init, lam_i, lamT_i = us0, None, None
        t0 = time.time()
        res = run(x0s, us_init, lam_init=lam_i, lamT_init=lamT_i)
        jax.block_until_ready(res.xs)
        wall = time.time() - t0
        prev = res
        summary = convergence_summary(res.converged, res.iterations)
        summary.update(
            wall_s=round(wall, 2),
            solves_per_s=round(int(jnp.sum(res.converged)) / wall, 3),
            ip_solves=int((run.stats.get("sweep_lanes", 0)
                           + run.stats.get("roll_lanes", 0))
                          * (prob.T - 1)),
            warm=bool(warm and s > 0))
        if ck is not None:
            ck.save(s, res, meta=summary)
        stats.append(summary)
        if verbose:
            print(f"shard {s}: {summary}", flush=True)
    return stats


def main(argv):
    if "--tpu" in argv or "--deploy" in argv:
        n = next((int(a) for a in argv if a.isdigit()), 256)
        run_sweep_deploy(n, warm="--warm" in argv)
    else:
        n = int(argv[0]) if argv and argv[0].isdigit() else 64
        run_sweep(n)


if __name__ == "__main__":
    main(sys.argv[1:])
