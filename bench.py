"""Benchmark: contact-implicit solver throughput on one chip.

Headline metric per BASELINE.md north star: full cartpole-with-friction
iLQR solves/s (reference configuration T=51, friction 0.35), counting
**converged solves only** (VERDICT r1 #10: throughput over failed lanes
is not throughput). A variant's number is accepted as headline only if
>= 90% of its lanes converged; otherwise the harness falls through to
the next variant and reports the best honest number it found.

Warm-start policy (bisected on CPU, scripts/repro_f32.py, and pinned by
tests/test_f32_tier.py): line-search rollouts run COLD — warm-starting
them from the previous accepted trajectory flips complementarity
branches on the knife-edge friction-0.35 swing-up (6/16 lanes in f32,
3/16 even in f64) — while the derivative sweep warm-starts from the
accepted trajectory's own eval solution (benign: same theta, same
branch; 16/16 lanes, ~2x faster).

The round-1/2 TPU backend intermittently faults on monolithic full-solve
programs (docs/fault_ladder.json: solve_batched faults, segmented phases
and the fused Pallas kernel pass), so the harness tries variants in
order, each in an isolated subprocess (a device fault poisons the jax
client):

  1. segmented executor + fused Pallas IP dynamics (deploy target);
  2. segmented executor, XLA batched-native dynamics;
  3. monolithic batched full solve (vmap-free lockstep);
  4. single full-solve latency;
  5. batched implicit dynamics steps (innermost hot op).

A global wall-clock deadline (ODX_BENCH_DEADLINE_S, default 35 min)
bounds the whole harness: when it trips, the best result found so far is
reported instead of nothing. "#"-prefixed progress lines per variant
leave evidence in the output tail even on an external kill.

Prints exactly one JSON line (the last line of output).
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import time

# XLA fusions around the fused Pallas solver slightly exceed the 16 MB
# default scoped-vmem budget. Unknown flags in XLA_FLAGS abort the local
# parser on this backend build, so the TPU-only flag must travel via
# LIBTPU_INIT_ARGS, which the axon remote-compile service snapshots and
# forwards. Must be set before backend init.
if "scoped_vmem" not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "")
        + " --xla_tpu_scoped_vmem_limit_kib=131072").strip()

HERE = os.path.dirname(os.path.abspath(__file__))
TARGET_PER_CHIP = 1000.0 / 16.0          # north-star solves/s per chip
# IP solves per converged full solve, MEASURED by the segmented
# executor's dispatch counters at the deploy config (round 4:
# (sweep_lanes + roll_lanes) * (T-1) / converged = ~68.9k (round 5),
# logs/bench_r4_alsched_run1.log; the round-1 hand estimate was 37k
# for a sequential-shape solve). Only used to convert the steps/s
# fallback variant into solve-equivalents for vs_baseline.
STEPS_PER_SOLVE = 68870.0
CONV_GATE = 0.9                          # headline needs >= 90% converged


def _setup_jax():
    import jax
    on_tpu = jax.default_backend() != "cpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    # TPU matmuls default to bf16 multiplicands on the MXU; the Riccati
    # einsums, Cholesky solves, and IFT linear solves need full f32
    # (CPU-f32 converges 16/16 where the bf16 chip run lost lanes). The
    # KKT/Riccati matrices are tiny (nz<=35, nx<=16), so the 3-pass f32
    # emulation cost is noise.
    if os.environ.get("ODX_MATMUL_PRECISION", "highest") != "default":
        jax.config.update("jax_default_matmul_precision", "highest")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(HERE, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    return jax, on_tpu


def _build(on_tpu: bool, dtype, fused: bool = True):
    """Deploy-tier problem — lives in the package now (VERDICT r3 #7:
    the benched configuration must be reachable from the user-facing
    API): ``examples.cartpole.build_deploy_problem``.

    ODX_BENCH_FROLL=1 enables the whole-rollout fused kernel (round 5,
    ops/pallas/fused_rollout.py): every line-search/open rollout is ONE
    Pallas launch instead of a scan of per-step launches + glue."""
    from optimization_dynamics_tpu.examples import cartpole as ex

    froll = os.environ.get("ODX_BENCH_FROLL", "0") == "1"
    # central-path schedule A/B knobs (round 5): each rollout step's IP
    # solve walks the kappa continuation from scratch (~15-20 Newton
    # iterations at the defaults); ODX_BENCH_KSCALE / ODX_BENCH_KINITMAX
    # / ODX_BENCH_CFRAC override the schedule
    ipo = {}
    if os.environ.get("ODX_BENCH_KSCALE"):
        ipo["kappa_scale"] = float(os.environ["ODX_BENCH_KSCALE"])
    if os.environ.get("ODX_BENCH_KINITMAX"):
        ipo["kappa_init_max"] = float(os.environ["ODX_BENCH_KINITMAX"])
    if os.environ.get("ODX_BENCH_CFRAC"):
        ipo["center_frac"] = float(os.environ["ODX_BENCH_CFRAC"])
    return ex.build_deploy_problem(on_tpu, dtype=dtype, fused=fused,
                                   fused_rollout=froll,
                                   ip_overrides=ipo or None)


def _x0s(jax, jnp, x0, B, dtype):
    key = jax.random.PRNGKey(0)
    return (jnp.tile(x0.astype(dtype), (B, 1))
            + 0.01 * jax.random.normal(key, (B, 4), dtype))


def _result(name, B, n_conv, dt):
    v = n_conv / dt
    return {
        "metric": ("cartpole-friction CONVERGED full iLQR solves/s "
                   "(1 chip, %s, batch %d, %d/%d converged)"
                   % (name, B, n_conv, B)),
        "value": round(v, 3), "unit": "converged solves/s",
        "vs_baseline": round(v / TARGET_PER_CHIP, 4),
        "converged_frac": round(n_conv / B, 4),
        "batch": B, "wall_s": round(dt, 1),
    }


def _run_segmented(fused: bool, B: int):
    jax, on_tpu = _setup_jax()
    import jax.numpy as jnp
    from optimization_dynamics_tpu.solver.ilqr_segmented import (
        make_segmented_solver)
    dtype = jnp.float32 if on_tpu else jnp.float64
    prob, x0, us0, opts = _build(on_tpu, dtype, fused=fused)
    if not on_tpu:
        B = 8
    # on-chip A/B knobs (scripts/segmented_profile.py feeds the winners
    # back as defaults): k inner iterations per device dispatch, and the
    # fused Pallas Riccati backward pass
    k = int(os.environ.get("ODX_BENCH_K", "1"))
    if os.environ.get("ODX_BENCH_PALLAS_RICCATI", "0") == "1":
        opts = dataclasses.replace(opts, pallas_riccati=on_tpu)
    # straggler policy: drop provably-hopeless lanes after 1 stalled AL
    # round (host-side only — phase programs and their compile-cache
    # keys are unchanged). Round-4 A/B at the champion schedule:
    # stall=1 converged the same 120/128 set at 108.9 s vs 113.6 s for
    # stall=2 (1.101 vs 1.056 solves/s; logs/bench_r4_stall1_run1.log)
    # — the projection criterion only fires once rho is capped, so the
    # earlier drop axes the same lanes, one round sooner.
    stall = int(os.environ.get("ODX_BENCH_STALL_ROUNDS", "1"))
    # per-lane adaptive line search (round-4 A/B: both variants LOST to
    # the slice cascade on-chip, so the default stays "0"/cascade).
    # "host": sequential per-lane rungs — 0.225 solves/s (each rung
    # pays a dispatch+sync round trip, 814 ms/iter). "device": the
    # one-dispatch adaptive inner step — 0.429 solves/s (the nested
    # while(scan(pallas-kernel)) program runs ~786 ms/iter despite
    # fewer rolled alphas; deep control-flow overhead dominates).
    # Cascade + AL schedule: 1.056 solves/s (logs/bench_r4_*).
    pla_env = os.environ.get("ODX_BENCH_PLA", "0")
    pla = ({"device": "device", "1": True, "host": True}.get(pla_env,
                                                             False)
           if k == 1 else False)
    if k > 1 and pla_env not in ("", "0"):
        print("# WARNING: ODX_BENCH_PLA=%s ignored because "
              "ODX_BENCH_K=%d > 1 (per-lane alpha needs the k=1 "
              "cascade path)" % (pla_env, k), flush=True)
    # per-AL-round inner budgets (round-4 A/B winner, now the default):
    # early AL rounds polish a penalty surface that the next dual
    # update discards — capping them cut mean inner iterations 455.8
    # -> 145.4 and lifted the chip headline 0.395 -> 1.056 converged
    # solves/s at 120/128 converged (logs/bench_r4_alsched_run1.log).
    # Override with ODX_BENCH_ALSCHED="a,b,c" or disable with "none".
    sched_env = os.environ.get("ODX_BENCH_ALSCHED", "15,15,25,25,30")
    sched = (None if sched_env in ("", "none")
             else [int(s) for s in sched_env.split(",")])
    # ODX_BENCH_LOG=1: per-AL-round host log (costs a scalar device sync
    # per inner iteration — diagnosis only, skews the timing slightly)
    log = ((lambda s: print("# " + s, flush=True))
           if os.environ.get("ODX_BENCH_LOG", "0") == "1" else None)
    x0s = _x0s(jax, jnp, x0, B, dtype)
    run = make_segmented_solver(prob, opts, B, dtype=dtype,
                                iters_per_dispatch=k,
                                per_lane_alpha=pla,
                                max_iter_schedule=sched,
                                al_stall_rounds=stall, log=log)
    res = run(x0s, us0.astype(dtype))
    jax.block_until_ready(res.xs)
    # best-of-N timed samples (the reference's BenchmarkTools harness
    # reports min/median of many samples for the same reason): the
    # axon tunnel's per-dispatch latency drifts run to run — identical
    # programs and dispatch counts measured 227/312/463 s walls
    # back-to-back (logs/bench_r5_{b512,final_run2,headline_run3}.log)
    n_samples = int(os.environ.get("ODX_BENCH_SAMPLES", "2"))
    walls = []
    for _ in range(max(n_samples, 1)):
        t0 = time.perf_counter()
        res = run(x0s, us0.astype(dtype))
        jax.block_until_ready(res.xs)
        walls.append(time.perf_counter() - t0)
        print("# headline sample wall %.1fs" % walls[-1], flush=True)
    dt = min(walls)
    name = "segmented+fused-ip" if fused else "segmented+xla"
    if k > 1:
        name += " k=%d" % k
    if pla:
        name += " pla" if pla is True else " pla-dev"
    n_conv = int(jnp.sum(res.converged))
    out = _result(name, B, n_conv, dt)
    out["wall_s_samples"] = [round(w, 1) for w in walls]
    out["mean_inner_iters"] = round(float(jnp.mean(res.iterations)), 1)
    # measured dispatch accounting (VERDICT r3 #8): IP solves per
    # converged solve, derived from the executor's host-side counters
    T = prob.T
    ip_solves = (run.stats.get("sweep_lanes", 0)
                 + run.stats.get("roll_lanes", 0)) * (T - 1)
    # the k>1 scan path records no sweep/roll counters — omit the
    # accounting rather than reporting a silent ~0 (round-4 advisor)
    if n_conv and ip_solves > 0:
        out["ip_solves_per_converged"] = int(ip_solves / n_conv)
    out["dispatched_inner_iters"] = run.stats.get("inner_iters", 0)
    return out


# headline batch width (round-5 on-chip scaling at the champion kappa
# schedule, logs/bench_r5_b*.log): host+dispatch is a fixed ~28% per
# iteration, so wider batches amortize it — B=128: 1.507 solves/s,
# B=256: 1.816, B=512: 2.134, all at ~95-96% converged. 512 keeps the
# headline warmup+timed pair ~470 s, leaving deadline room for the
# per-system tail lines.
def variant_segmented_fused():
    return _run_segmented(True, int(os.environ.get("ODX_BENCH_B", "512")))


def variant_segmented():
    return _run_segmented(False, int(os.environ.get("ODX_BENCH_B", "512")))


def variant_batched(B: int = 64):
    """Monolithic batched-native lockstep solver (docs/DESIGN.md §6)."""
    jax, on_tpu = _setup_jax()
    import jax.numpy as jnp
    from optimization_dynamics_tpu.solver.ilqr_batched import solve_batched
    dtype = jnp.float32 if on_tpu else jnp.float64
    prob, x0, us0, opts = _build(on_tpu, dtype)
    if not on_tpu:
        B = 8
    x0s = _x0s(jax, jnp, x0, B, dtype)
    run = jax.jit(lambda xs: solve_batched(prob, xs, us0.astype(dtype),
                                           opts))
    res = run(x0s)
    jax.block_until_ready(res.xs)
    t0 = time.perf_counter()
    res = run(x0s)
    jax.block_until_ready(res.xs)
    dt = time.perf_counter() - t0
    return _result("monolithic batched", B, int(jnp.sum(res.converged)),
                   dt)


def variant_single():
    jax, on_tpu = _setup_jax()
    import jax.numpy as jnp
    from optimization_dynamics_tpu.solver.ilqr import solve
    dtype = jnp.float32 if on_tpu else jnp.float64
    prob, x0, us0, opts = _build(on_tpu, dtype)
    run = jax.jit(lambda x: solve(prob, x, us0.astype(dtype), opts))
    res = run(x0.astype(dtype))
    jax.block_until_ready(res.xs)
    runs = 3
    t0 = time.perf_counter()
    for _ in range(runs):
        res = run(x0.astype(dtype))
        jax.block_until_ready(res.xs)
    dt = (time.perf_counter() - t0) / runs
    n_conv = int(bool(res.converged))
    return _result("unbatched latency", 1, n_conv, dt)


def variant_push(B: int = 256):
    """Second contact system on the chip (VERDICT r3 #4): planar push
    TRANSLATE at the reference config (T=26, h=0.1) — nz=35, the
    hardest cone geometry (orthant + 4x SOC(3) + SOC(2)) — through the
    deploy tier (segmented + fused + per-lane line search). Scenarios
    rigidly translate the whole scene (block + pusher) so the contact
    geometry stays feasible while the reach-the-goal problem varies.
    Worker-only variant: run `python bench.py push`; recorded in
    BASELINE.md / docs/fault_ladder.json, not the headline line."""
    jax, on_tpu = _setup_jax()
    import jax.numpy as jnp
    from optimization_dynamics_tpu.examples import planar_push as expp
    from optimization_dynamics_tpu.solver.ilqr_segmented import (
        make_segmented_solver)
    dtype = jnp.float32 if on_tpu else jnp.float64
    # fused nz=35 kernel (round 5): at 32-lane blocks it compiles in
    # 83.5 s and runs 64/64 at the identical objective — 21.3 converged
    # solves/s vs 8.46 for the XLA phases (2.5x,
    # logs/bench_r5_push_fused.log) — so fused is now the default;
    # ODX_BENCH_PUSH_FUSED=0 restores the XLA path.
    fused = os.environ.get("ODX_BENCH_PUSH_FUSED", "1") == "1"
    prob, x0, us0, opts = expp.build_deploy_problem(on_tpu, "translate",
                                                    dtype=dtype,
                                                    fused=fused)
    B = int(os.environ.get("ODX_BENCH_PUSH_B", str(B)))
    if not on_tpu:
        B = 4
    key = jax.random.PRNGKey(0)
    delta = 0.02 * jax.random.normal(key, (B, 2), dtype)
    shift = jnp.zeros((B, 10), dtype)
    for i in (0, 1):                      # block xy, both configs
        shift = shift.at[:, i].add(delta[:, i])
        shift = shift.at[:, i + 3].add(delta[:, i])   # pusher xy
        shift = shift.at[:, i + 5].add(delta[:, i])
        shift = shift.at[:, i + 8].add(delta[:, i])
    x0s = jnp.tile(x0.astype(dtype), (B, 1)) + shift
    pla_env = os.environ.get("ODX_BENCH_PLA", "0")
    pla = {"device": "device", "1": True, "host": True}.get(pla_env,
                                                            False)
    stall = int(os.environ.get("ODX_BENCH_STALL_ROUNDS", "2"))
    log = ((lambda s: print("# " + s, flush=True))
           if os.environ.get("ODX_BENCH_LOG", "0") == "1" else None)
    sched_env = os.environ.get("ODX_BENCH_ALSCHED", "none")
    sched = (None if sched_env in ("", "none")
             else [int(s) for s in sched_env.split(",")])
    run = make_segmented_solver(prob, opts, B, dtype=dtype,
                                per_lane_alpha=pla,
                                max_iter_schedule=sched,
                                al_stall_rounds=stall, log=log)
    res = run(x0s, us0.astype(dtype))
    jax.block_until_ready(res.xs)
    t0 = time.perf_counter()
    res = run(x0s, us0.astype(dtype))
    jax.block_until_ready(res.xs)
    dt = time.perf_counter() - t0
    n_conv = int(jnp.sum(res.converged))
    v = n_conv / dt
    out = {
        "metric": ("planar-push nz=35 CONVERGED full iLQR solves/s "
                   "(1 chip, segmented+%s%s, batch %d, %d/%d "
                   "converged)"
                   % ("fused" if fused else "xla",
                      " pla-dev" if pla == "device"
                      else " pla" if pla else "", B, n_conv, B)),
        "value": round(v, 3), "unit": "converged solves/s",
        "vs_baseline": round(v / TARGET_PER_CHIP, 4),
        "converged_frac": round(n_conv / B, 4),
        "batch": B, "wall_s": round(dt, 1),
        "mean_inner_iters": round(float(jnp.mean(res.iterations)), 1),
        # objective sanity vs the CPU-f64 golden (translate ~11.8,
        # tests/goldens.json): a "converged" batch far from it means
        # the lenient f32 con_tol let a degenerate optimum through
        "mean_obj_converged": round(float(
            jnp.sum(jnp.where(res.converged, res.objective, 0.0))
            / jnp.maximum(jnp.sum(res.converged), 1)), 3),
        "max_vio": round(float(jnp.max(res.constraint_violation)), 5),
    }
    ip_solves = (run.stats.get("sweep_lanes", 0)
                 + run.stats.get("roll_lanes", 0)) * (prob.T - 1)
    if n_conv and ip_solves > 0:
        out["ip_solves_per_converged"] = int(ip_solves / n_conv)
    return out


def variant_acrobot(B: int = 256):
    """Third contact system on the chip: acrobot swing-up with hard
    elbow joint limits at the reference config (T=101, orthant
    complementarity nz=6) through the deploy tier (fused nz=6 kernel —
    round-5 Mosaic fix; ODX_BENCH_ACROBOT_FUSED=0 forces the XLA
    phase path, the degrade-to-a-number fallback of VERDICT r4 #8).
    Worker: `python bench.py acrobot`; recorded in BASELINE.md."""
    jax, on_tpu = _setup_jax()
    import jax.numpy as jnp
    from optimization_dynamics_tpu.examples import acrobot as exac
    from optimization_dynamics_tpu.solver.ilqr_segmented import (
        make_segmented_solver)
    dtype = jnp.float32 if on_tpu else jnp.float64
    fused = os.environ.get("ODX_BENCH_ACROBOT_FUSED", "1") == "1"
    prob, x0, us0, opts = exac.build_deploy_problem(on_tpu, dtype=dtype,
                                                    fused=fused)
    B = int(os.environ.get("ODX_BENCH_ACROBOT_B", str(B)))
    if not on_tpu:
        B = 4
    x0s = _x0s(jax, jnp, x0, B, dtype)
    stall = int(os.environ.get("ODX_BENCH_STALL_ROUNDS", "1"))
    sched_env = os.environ.get("ODX_BENCH_ALSCHED", "15,15,25,25,30")
    sched = (None if sched_env in ("", "none")
             else [int(s) for s in sched_env.split(",")])
    log = ((lambda s: print("# " + s, flush=True))
           if os.environ.get("ODX_BENCH_LOG", "0") == "1" else None)
    run = make_segmented_solver(prob, opts, B, dtype=dtype,
                                max_iter_schedule=sched,
                                al_stall_rounds=stall, log=log)
    res = run(x0s, us0.astype(dtype))
    jax.block_until_ready(res.xs)
    t0 = time.perf_counter()
    res = run(x0s, us0.astype(dtype))
    jax.block_until_ready(res.xs)
    dt = time.perf_counter() - t0
    n_conv = int(jnp.sum(res.converged))
    v = n_conv / dt
    out = {
        "metric": ("acrobot joint-limits CONVERGED full iLQR solves/s "
                   "(1 chip, segmented+%s, batch %d, %d/%d "
                   "converged)" % ("fused" if fused else "xla", B,
                                   n_conv, B)),
        "value": round(v, 3), "unit": "converged solves/s",
        "vs_baseline": round(v / TARGET_PER_CHIP, 4),
        "converged_frac": round(n_conv / B, 4),
        "batch": B, "wall_s": round(dt, 1),
        "mean_inner_iters": round(float(jnp.mean(res.iterations)), 1),
        "mean_obj_converged": round(float(
            jnp.sum(jnp.where(res.converged, res.objective, 0.0))
            / jnp.maximum(jnp.sum(res.converged), 1)), 3),
        "max_vio": round(float(jnp.max(res.constraint_violation)), 5),
    }
    ip_solves = (run.stats.get("sweep_lanes", 0)
                 + run.stats.get("roll_lanes", 0)) * (prob.T - 1)
    if n_conv and ip_solves > 0:
        out["ip_solves_per_converged"] = int(ip_solves / n_conv)
    return out


def variant_rocket(B: int = 16):  # wall ~115 s; at B=32 the worker (2 solves + subprocess overhead) overran the tail budget on slow-tunnel runs
    """Rocket soft landing at the reference config (T=61, h=0.05,
    /root/reference/examples/rocket.jl) through the segmented executor:
    two chained IP solves per step (cold SOC thrust projection +
    implicit midpoint, XLA batched-native phases). Worker:
    `python bench.py rocket`; also appended to the driver tail."""
    jax, on_tpu = _setup_jax()
    import jax.numpy as jnp
    import numpy as np
    from optimization_dynamics_tpu.examples import rocket as exr
    from optimization_dynamics_tpu.solver.ilqr_segmented import (
        make_segmented_solver)
    dtype = jnp.float32 if on_tpu else jnp.float64
    prob, x1, us0, opts = exr.build_deploy_problem(on_tpu, dtype=dtype)
    if not on_tpu:
        B = 4
    key = jax.random.PRNGKey(0)
    # scenario axis: initial position/velocity scatter (keeps attitude)
    delta = jnp.zeros((B, 12), dtype)
    delta = delta.at[:, 0:3].set(
        0.1 * jax.random.normal(key, (B, 3), dtype))
    delta = delta.at[:, 6:9].set(
        0.05 * jax.random.normal(jax.random.fold_in(key, 1), (B, 3),
                                 dtype))
    x0s = jnp.tile(x1.astype(dtype), (B, 1)) + delta
    stall = int(os.environ.get("ODX_BENCH_STALL_ROUNDS", "2"))
    # per-AL-round inner budgets (cartpole champion schedule; the CPU
    # validation run burned 481 mean inner iterations without it —
    # early AL rounds over-polish, same mechanism as the flagship)
    sched_env = os.environ.get("ODX_BENCH_ALSCHED", "15,15,25,25,30")
    sched = (None if sched_env in ("", "none")
             else [int(s) for s in sched_env.split(",")])
    log = ((lambda s: print("# " + s, flush=True))
           if os.environ.get("ODX_BENCH_LOG", "0") == "1" else None)
    run = make_segmented_solver(prob, opts, B, dtype=dtype,
                                max_iter_schedule=sched,
                                al_stall_rounds=stall, log=log)
    res = run(x0s, us0.astype(dtype))
    jax.block_until_ready(res.xs)
    t0 = time.perf_counter()
    res = run(x0s, us0.astype(dtype))
    jax.block_until_ready(res.xs)
    dt = time.perf_counter() - t0
    n_conv = int(jnp.sum(res.converged))
    v = n_conv / dt
    out = {
        "metric": ("rocket soft-landing CONVERGED full iLQR solves/s "
                   "(1 chip, segmented+xla 2-IP step, batch %d, %d/%d "
                   "converged)" % (B, n_conv, B)),
        "value": round(v, 3), "unit": "converged solves/s",
        "vs_baseline": round(v / TARGET_PER_CHIP, 4),
        "converged_frac": round(n_conv / B, 4),
        "batch": B, "wall_s": round(dt, 1),
        "mean_inner_iters": round(float(jnp.mean(res.iterations)), 1),
        "max_vio": round(float(jnp.max(res.constraint_violation)), 5),
    }
    ip_solves = (run.stats.get("sweep_lanes", 0)
                 + run.stats.get("roll_lanes", 0)) * (prob.T - 1)
    if n_conv and ip_solves > 0:
        # x2: each rollout step is TWO IP solves (projection + dynamics)
        out["ip_solves_per_converged"] = int(2 * ip_solves / n_conv)
    return out


def variant_hopper(B: int = 256):
    """Hopper gait generation at the reference config (T=21, gait 1,
    /root/reference/examples/hopper.jl) through the segmented executor:
    the state-augmented parameter-opt program (nz=20 contact IP per
    step). Worker: `python bench.py hopper`."""
    jax, on_tpu = _setup_jax()
    import jax.numpy as jnp
    from optimization_dynamics_tpu.examples import hopper as exh
    from optimization_dynamics_tpu.solver.ilqr_segmented import (
        make_segmented_solver)
    dtype = jnp.float32 if on_tpu else jnp.float64
    prob, x0, us0, opts = exh.build_deploy_problem(on_tpu, gait=1,
                                                   dtype=dtype)
    B = int(os.environ.get("ODX_BENCH_HOPPER_B", str(B)))
    if not on_tpu:
        B = 2
    key = jax.random.PRNGKey(0)
    # scenario axis: perturb the (co-optimized) initial configuration
    # guess via x0 — the problem re-optimizes it, so this scatters the
    # optimizer's starting point rather than the constraint data
    x0s = (jnp.tile(x0.astype(dtype), (B, 1))
           + 0.005 * jax.random.normal(key, (B, x0.shape[0]), dtype))
    stall = int(os.environ.get("ODX_BENCH_STALL_ROUNDS", "2"))
    # per-AL-round inner budgets (cartpole champion schedule; the CPU
    # validation run burned 481 mean inner iterations without it —
    # early AL rounds over-polish, same mechanism as the flagship)
    sched_env = os.environ.get("ODX_BENCH_ALSCHED", "15,15,25,25,30")
    sched = (None if sched_env in ("", "none")
             else [int(s) for s in sched_env.split(",")])
    log = ((lambda s: print("# " + s, flush=True))
           if os.environ.get("ODX_BENCH_LOG", "0") == "1" else None)
    run = make_segmented_solver(prob, opts, B, dtype=dtype,
                                max_iter_schedule=sched,
                                al_stall_rounds=stall, log=log)
    res = run(x0s, us0.astype(dtype))
    jax.block_until_ready(res.xs)
    t0 = time.perf_counter()
    res = run(x0s, us0.astype(dtype))
    jax.block_until_ready(res.xs)
    dt = time.perf_counter() - t0
    n_conv = int(jnp.sum(res.converged))
    v = n_conv / dt
    out = {
        "metric": ("hopper gait-1 CONVERGED full iLQR solves/s "
                   "(1 chip, segmented+xla, batch %d, %d/%d converged)"
                   % (B, n_conv, B)),
        "value": round(v, 3), "unit": "converged solves/s",
        "vs_baseline": round(v / TARGET_PER_CHIP, 4),
        "converged_frac": round(n_conv / B, 4),
        "batch": B, "wall_s": round(dt, 1),
        "mean_inner_iters": round(float(jnp.mean(res.iterations)), 1),
        "max_vio": round(float(jnp.max(res.constraint_violation)), 5),
    }
    ip_solves = (run.stats.get("sweep_lanes", 0)
                 + run.stats.get("roll_lanes", 0)) * (prob.T - 1)
    if n_conv and ip_solves > 0:
        out["ip_solves_per_converged"] = int(ip_solves / n_conv)
    return out


def variant_steps(B: int = 128):
    jax, on_tpu = _setup_jax()
    import jax.numpy as jnp
    from optimization_dynamics_tpu.dynamics import make_implicit_dynamics
    from optimization_dynamics_tpu.models import planar_push as pp
    from optimization_dynamics_tpu.solver.interior_point import IPOptions
    dtype = jnp.float32 if on_tpu else jnp.float64
    r_tol = 1.0e-5 if on_tpu else 1.0e-8
    dyn = make_implicit_dynamics(
        pp.model(),
        eval_opts=IPOptions(r_tol=r_tol, kappa_tol=1.0e-3, max_iter=30),
        grad_opts=IPOptions(r_tol=r_tol, kappa_tol=1.0e-2, max_iter=30))
    aux = pp.PlanarPushAux(h=0.1)
    q = jnp.array([0.0, 0.0, 0.0, -pp.R_DIM - 1e-6, 0.0], dtype)
    xs = jnp.tile(jnp.concatenate([q, q]), (B, 1))
    us = jnp.tile(jnp.array([1.0, 0.1], dtype), (B, 1))
    run = jax.jit(jax.vmap(lambda x, u: dyn.step(x, u, aux)))
    out = run(xs, us)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = run(xs, us)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5
    v = B / dt
    # express as equivalent solves/s for vs_baseline comparability
    return {
        "metric": ("contact-implicit dynamics steps/s, planar push nz=35 "
                   "(1 chip, batch %d) [fallback: full-solve programs "
                   "fault on this backend]" % B),
        "value": round(v, 1), "unit": "steps/s",
        "vs_baseline": round((v / STEPS_PER_SOLVE) / TARGET_PER_CHIP, 6),
        "converged_frac": 1.0,
    }


VARIANTS = ["segmented_fused", "segmented", "batched", "single", "steps"]
# per-system worker lines appended to the driver tail AFTER the
# headline succeeds (VERDICT r4 #7: one JSON line per system); each in
# its own subprocess, bounded by the remaining deadline. The headline
# JSON stays the LAST line of output (the driver parses the last line).
# cheapest-first so a degraded-tunnel run still records most lines
# (warm walls: hopper ~60 s, push ~60 s, acrobot ~160 s, rocket ~500 s)
EXTRA_SYSTEMS = ["hopper", "push", "acrobot", "rocket"]
WORKERS = {}


def main():
    if len(sys.argv) > 1:          # worker mode
        name = sys.argv[1]
        fn = {"segmented_fused": variant_segmented_fused,
              "segmented": variant_segmented,
              "batched": variant_batched,
              "single": variant_single, "steps": variant_steps,
              "push": variant_push, "acrobot": variant_acrobot,
              "rocket": variant_rocket, "hopper": variant_hopper}[name]
        print(json.dumps(fn()), flush=True)
        return

    env = dict(os.environ)
    env["PYTHONPATH"] = HERE + os.pathsep + env.get("PYTHONPATH", "")
    # Global wall-clock deadline (VERDICT r2 #1: the round-2 harness blew
    # the driver budget with rc=124 and zero evidence). When the deadline
    # hits, print the best result found so far instead of dying silently.
    # Progress lines per variant ("#"-prefixed, flushed) leave evidence in
    # the output tail even if the harness is killed from outside.
    deadline = float(os.environ.get("ODX_BENCH_DEADLINE_S", "2100"))
    per_variant = float(os.environ.get("ODX_BENCH_VARIANT_TIMEOUT_S",
                                       "1800"))
    t_start = time.monotonic()

    def note(msg):
        print("# " + msg, flush=True)

    def run_worker(name, budget):
        """Run one worker subprocess; return (parsed_json_or_None,
        err_snippet)."""
        t0 = time.monotonic()
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name],
                capture_output=True, text=True, timeout=budget, env=env)
        except subprocess.TimeoutExpired:
            note("variant %s timed out after %.0fs" % (name, budget))
            return None, f"variant {name} timed out"
        parsed = None
        for line in out.stdout.strip().splitlines()[::-1]:
            line = line.strip()
            if line.startswith("{"):
                parsed = json.loads(line)
                break
        if parsed is None:
            note("variant %s produced no result (rc=%d): %s"
                 % (name, out.returncode,
                    (out.stderr or "")[-200:].replace("\n", " ")))
            return None, out.stderr[-300:]
        note("variant %s done in %.0fs: value=%s conv=%s"
             % (name, time.monotonic() - t0, parsed.get("value"),
                parsed.get("converged_frac")))
        return parsed, None

    last_err = None
    best_gated = None            # completed but < CONV_GATE converged
    headline = None
    for name in VARIANTS:
        remaining = deadline - (time.monotonic() - t_start)
        if remaining < 120.0:
            note("deadline reached before variant %s" % name)
            break
        budget = min(per_variant, remaining)
        note("variant %s starting (budget %.0fs)" % (name, budget))
        parsed, err = run_worker(name, budget)
        if parsed is None:
            last_err = err
            continue
        if parsed.get("converged_frac", 0.0) >= CONV_GATE:
            headline = parsed
            break
        if (best_gated is None
                or parsed.get("value", 0) > best_gated.get("value", 0)):
            best_gated = parsed

    if headline is not None:
        # per-system tail lines (VERDICT r4 #7): each extra system in
        # its own subprocess within the remaining deadline, its JSON
        # printed BEFORE the headline (the driver parses the LAST line)
        for name in EXTRA_SYSTEMS:
            remaining = deadline - (time.monotonic() - t_start)
            if remaining < 180.0:
                note("deadline: skipping remaining per-system lines")
                break
            budget = min(float(os.environ.get(
                "ODX_BENCH_EXTRA_TIMEOUT_S", "600")), remaining - 60.0)
            note("extra system %s starting (budget %.0fs)"
                 % (name, budget))
            parsed, _ = run_worker(name, budget)
            if parsed is not None:
                print(json.dumps(parsed), flush=True)
        print(json.dumps(headline), flush=True)
        return
    if best_gated is not None:
        # below the honesty gate: report it, but flag it loudly
        best_gated["metric"] = ("[BELOW %.0f%% CONVERGENCE GATE] "
                                % (100 * CONV_GATE)) + best_gated["metric"]
        print(json.dumps(best_gated), flush=True)
        return
    print(json.dumps({
        "metric": "benchmark failed on all variants: %s" % (last_err or ""),
        "value": 0.0, "unit": "solves/s", "vs_baseline": 0.0,
    }), flush=True)


if __name__ == "__main__":
    main()
