"""TPU backend fault repro ladder (VERDICT round-1 #4).

Round 1 observed runtime "TPU device error" faults from *some* full-solve
programs (vmapped whole-iLQR solves; the fused batched solve) while every
building block passed in isolation — and the failing set shifted when the
backend build rotated mid-session (docs/DESIGN.md §6). This script pins
the boundary: it runs an escalating ladder of program shapes, each in an
isolated subprocess (a device fault poisons the jax client), and records
rung -> pass/fault. Keep running it after backend rotations as a
regression probe.

Rungs (cartpole-friction, f32, bench tolerances r_tol=3e-5 kappa=1e-3):

  r1_fused_alone      fused Pallas IP kernel, one call, B=128
  r2_fused_scan       fused kernel inside a T=51 lax.scan rollout
  r3_fused_while      fused kernel inside a lax.while_loop (5 rollouts)
  r4_fused_linesearch the batched line-search phase (scan of fused steps
                      over an 8-alpha x B grid) — ilqr hot phase
  r5_xla_batched      batched-native XLA full solve_batched, B=16, T=21
  r6_vmap_full        vmap of the scalar full solve, B=4, T=21
                      (the round-1 faulting shape)
  r7_fused_full       solve_batched with fused=True, B=128, T=51
                      (the round-1 faulting fused program)
  r8_segmented_fused  segmented executor phases with fused dynamics,
                      B=128, T=51 (the deploy target for BENCH_r02)
  r9_segmented_kscan  segmented executor with iters_per_dispatch=4 (the
                      k-iteration lax.scan chunk — mid-way between a
                      phase and the monolithic r7 shape)

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/fault_ladder.py
  ... RUNG       # worker mode: run one rung in-process

Writes docs/fault_ladder.json and prints a markdown table.
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

if "scoped_vmem" not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "")
        + " --xla_tpu_scoped_vmem_limit_kib=131072").strip()

RUNGS = [
    "r1_fused_alone",
    "r2_fused_scan",
    "r3_fused_while",
    "r4_fused_linesearch",
    "r5_xla_batched",
    "r6_vmap_full",
    "r7_fused_full",
    "r8_segmented_fused",
    "r9_segmented_kscan",
    "r10_deploy_compact",
    "r11_deploy_nocompact",
]

# generous: remote compiles of full-solve programs take 10-30 min cold
TIMEOUT_S = {"r7_fused_full": 3600, "r8_segmented_fused": 3600,
             "r9_segmented_kscan": 3600, "r10_deploy_compact": 3600,
             "r11_deploy_nocompact": 3600}
DEFAULT_TIMEOUT_S = 2400


def _setup():
    import jax
    # full-f32 matmuls, exactly as bench._setup_jax: the deploy config's
    # Riccati/KKT math needs f32 accumulation — default bf16 multiplicands
    # lose lanes on the knife edge (docs/DESIGN.md §4). The ladder must
    # run the SAME program the bench deploys, or its convergence gate
    # measures a different solver (round-3: an unaligned r8 "converged
    # <90%" false alarm traced to this + kappa_init_min below).
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return jax


def _ip_opts():
    # MUST mirror bench._build's on_tpu ip dict (same traced program,
    # same compile-cache keys). bench omits kappa_init_min: eval/grad
    # solves start their kappa continuation from the bilinear violation
    # clipped at kappa_final, not at 1e-2.
    from optimization_dynamics_tpu.solver.interior_point import IPOptions
    return IPOptions(r_tol=3.0e-5, kappa_tol=1.0e-3, max_iter=40,
                     max_ls=8)


def _fused_solver():
    from optimization_dynamics_tpu.models import cartpole
    from optimization_dynamics_tpu.ops.pallas.fused_ip import (
        make_fused_ip_solver)
    model = cartpole.friction_model()
    return model, make_fused_ip_solver(model.residual, model.spec,
                                       _ip_opts())


def _inputs(jnp, model, B):
    import jax
    aux_fric = jnp.asarray([0.35, 0.35], jnp.float32)
    q1 = jnp.zeros(model.nq, jnp.float32)

    def theta_of(q0, q1, u):
        from optimization_dynamics_tpu.models import cartpole
        aux = cartpole.CartpoleAux(h=0.05, friction=aux_fric)
        return model.theta_fn(q0, q1, u, aux)

    key = jax.random.PRNGKey(0)
    q0s = 0.01 * jax.random.normal(key, (B, model.nq), jnp.float32)
    q1s = jnp.tile(q1, (B, 1))
    us = jnp.zeros((B, model.nu), jnp.float32)
    thetas = jax.vmap(theta_of)(q0s, q1s, us)
    z0s = jax.vmap(model.init_z)(q1s)
    return z0s, thetas


def r1_fused_alone():
    jax = _setup()
    import jax.numpy as jnp
    model, solve = _fused_solver()
    z0s, thetas = _inputs(jnp, model, 128)
    sol = jax.jit(solve)(z0s, thetas)
    jax.block_until_ready(sol.z)
    return {"converged": int(sol.converged.sum()), "B": 128}


def r2_fused_scan():
    jax = _setup()
    import jax.numpy as jnp
    from optimization_dynamics_tpu.dynamics import make_implicit_dynamics
    from optimization_dynamics_tpu.models import cartpole
    model = cartpole.friction_model()
    dyn = make_implicit_dynamics(model, eval_opts=_ip_opts(),
                                 grad_opts=_ip_opts(), fused=True)
    aux = cartpole.CartpoleAux(
        h=0.05, friction=jnp.asarray([0.35, 0.35], jnp.float32))
    B, T = 128, 51
    xs = jnp.zeros((B, 4), jnp.float32)
    us = jnp.zeros((T - 1, B, 1), jnp.float32).at[0].set(-1.5)

    def rollout(x0s, uss):
        def f(x, u):
            y = dyn.step_batched(x, u, aux)
            return y, y
        return jax.lax.scan(f, x0s, uss)

    _, ys = jax.jit(rollout)(xs, us)
    jax.block_until_ready(ys)
    return {"T": T, "B": B, "final_norm": float(jnp.abs(ys[-1]).max())}


def r3_fused_while():
    jax = _setup()
    import jax.numpy as jnp
    from optimization_dynamics_tpu.dynamics import make_implicit_dynamics
    from optimization_dynamics_tpu.models import cartpole
    model = cartpole.friction_model()
    dyn = make_implicit_dynamics(model, eval_opts=_ip_opts(),
                                 grad_opts=_ip_opts(), fused=True)
    aux = cartpole.CartpoleAux(
        h=0.05, friction=jnp.asarray([0.35, 0.35], jnp.float32))
    B, T = 128, 21
    us = jnp.zeros((T - 1, B, 1), jnp.float32)

    def run(x0s):
        def rollout(x0s):
            def f(x, u):
                y = dyn.step_batched(x, u, aux)
                return y, None
            y, _ = jax.lax.scan(f, x0s, us)
            return y

        def cond(s):
            i, _ = s
            return i < 5

        def body(s):
            i, x = s
            return i + 1, rollout(x) * 0.5

        return jax.lax.while_loop(cond, body, (0, x0s))

    _, y = jax.jit(run)(jnp.zeros((B, 4), jnp.float32))
    jax.block_until_ready(y)
    return {"B": B, "rollouts": 5}


def _bench_problem(fused: bool, T: int, batched_ws: bool = True):
    import jax
    import jax.numpy as jnp
    from optimization_dynamics_tpu.dynamics import make_implicit_dynamics
    from optimization_dynamics_tpu.examples import cartpole as ex
    from optimization_dynamics_tpu.models import cartpole
    prob, x0, us0, opts = ex.build_problem("friction", dtype=jnp.float32)
    model = cartpole.friction_model()
    aux = cartpole.CartpoleAux(
        h=ex.H, friction=jnp.asarray([0.35, 0.35], jnp.float32))
    dyn = make_implicit_dynamics(model, eval_opts=_ip_opts(),
                                 grad_opts=_ip_opts(), fused=fused)
    prob = prob._replace(
        T=T,
        dynamics=lambda t, x, u: dyn.step(x, u, aux),
        dynamics_jac=lambda t, x, u: dyn.step_jac(x, u, aux),
        dynamics_jac_batched=lambda ts, xs, us: dyn.step_jac_batched(
            xs, us, aux),
        dynamics_batched=lambda t, xs, us: dyn.step_batched(xs, us, aux),
        dynamics_carry=lambda t, x, u, z: dyn.step_carry(z, x, u, aux),
        carry_init=dyn.carry_init)
    if batched_ws:
        # ws_linesearch=False is the SHIPPED policy (bench.py, docs/DESIGN
        # §3): line-search rollouts run cold, only the derivative sweep
        # warm-starts. Round 2's r8 omitted it and converged 0/128 —
        # the ladder must run the same program the bench deploys.
        prob = prob._replace(
            dynamics_batched_ws=lambda t, xs, us, ws: dyn.step_batched_ws(
                xs, us, aux, ws),
            dynamics_jac_batched_ws=lambda ts, xs, us, wss:
                dyn.step_jac_batched_ws(xs, us, aux, wss),
            ws_init_batched=lambda t, xs, us: jax.vmap(dyn.carry_init)(xs),
            ws_linesearch=False)
    opts = dataclasses.replace(opts, con_tol=0.01, rho_max=1.0e6,
                               alpha_min=1.0e-2)
    us0 = us0[:T - 1]
    return prob, x0, us0, opts


def r4_fused_linesearch():
    jax = _setup()
    import jax.numpy as jnp
    from optimization_dynamics_tpu.solver.ilqr_batched import make_phases
    B, T = 16, 51
    prob, x0, us0, opts = _bench_problem(fused=True, T=T)
    ph = make_phases(prob, opts, B, jnp.float32)
    key = jax.random.PRNGKey(0)
    x0s = (jnp.tile(x0, (B, 1))
           + 0.01 * jax.random.normal(key, (B, 4), jnp.float32))
    uss = jnp.broadcast_to(us0[None], (B, T - 1, 1)).astype(jnp.float32)
    xss, wss = jax.jit(ph.rollout_open)(x0s, uss)
    lams = jnp.zeros((B, T - 1, 1), jnp.float32)
    lamTs = jnp.zeros((B, 4), jnp.float32)
    rhos = jnp.ones(B, jnp.float32)
    Kss = jnp.zeros((B, T - 1, 1, 4), jnp.float32)
    kss = jnp.zeros((B, T - 1, 1), jnp.float32)
    Js = jax.jit(ph.traj_cost)(xss, uss, lams, lamTs, rhos)
    out = jax.jit(ph.line_search)(
        xss, uss, Kss, kss, Js,
        jnp.zeros(B, jnp.float32), jnp.zeros(B, jnp.float32),
        lams, lamTs, rhos, wss)
    jax.block_until_ready(out[0])
    return {"B": B, "accepted": int(out[3].sum())}


def r5_xla_batched():
    jax = _setup()
    import jax.numpy as jnp
    from optimization_dynamics_tpu.solver.ilqr_batched import solve_batched
    B, T = 16, 21
    prob, x0, us0, opts = _bench_problem(fused=False, T=T)
    key = jax.random.PRNGKey(0)
    x0s = (jnp.tile(x0, (B, 1))
           + 0.01 * jax.random.normal(key, (B, 4), jnp.float32))
    res = jax.jit(lambda xs: solve_batched(prob, xs, us0, opts))(x0s)
    jax.block_until_ready(res.xs)
    return {"B": B, "T": T, "converged": int(res.converged.sum())}


def r6_vmap_full():
    jax = _setup()
    import jax.numpy as jnp
    from optimization_dynamics_tpu.solver.ilqr import solve
    B, T = 4, 21
    prob, x0, us0, opts = _bench_problem(fused=False, T=T,
                                         batched_ws=False)
    key = jax.random.PRNGKey(0)
    x0s = (jnp.tile(x0, (B, 1))
           + 0.01 * jax.random.normal(key, (B, 4), jnp.float32))
    res = jax.jit(jax.vmap(lambda x: solve(prob, x, us0, opts)))(x0s)
    jax.block_until_ready(res.xs)
    return {"B": B, "T": T, "converged": int(res.converged.sum())}


def r7_fused_full():
    jax = _setup()
    import jax.numpy as jnp
    from optimization_dynamics_tpu.solver.ilqr_batched import solve_batched
    B, T = 128, 51
    prob, x0, us0, opts = _bench_problem(fused=True, T=T)
    key = jax.random.PRNGKey(0)
    x0s = (jnp.tile(x0, (B, 1))
           + 0.01 * jax.random.normal(key, (B, 4), jnp.float32))
    res = jax.jit(lambda xs: solve_batched(prob, xs, us0, opts))(x0s)
    jax.block_until_ready(res.xs)
    return {"B": B, "T": T, "converged": int(res.converged.sum())}


def r8_segmented_fused():
    jax = _setup()
    import jax.numpy as jnp
    from optimization_dynamics_tpu.solver.ilqr_segmented import (
        make_segmented_solver)
    B, T = 128, 51
    prob, x0, us0, opts = _bench_problem(fused=True, T=T)
    key = jax.random.PRNGKey(0)
    x0s = (jnp.tile(x0, (B, 1))
           + 0.01 * jax.random.normal(key, (B, 4), jnp.float32))
    run = make_segmented_solver(prob, opts, B, dtype=jnp.float32,
                                al_stall_rounds=2,   # bench default policy
                                log=lambda s: print(s, flush=True))
    res = run(x0s, us0)
    jax.block_until_ready(res.xs)
    return {"B": B, "T": T, "converged": int(res.converged.sum())}


def r9_segmented_kscan():
    jax = _setup()
    import jax.numpy as jnp
    from optimization_dynamics_tpu.solver.ilqr_segmented import (
        make_segmented_solver)
    B, T = 128, 51
    prob, x0, us0, opts = _bench_problem(fused=True, T=T)
    key = jax.random.PRNGKey(0)
    x0s = (jnp.tile(x0, (B, 1))
           + 0.01 * jax.random.normal(key, (B, 4), jnp.float32))
    run = make_segmented_solver(prob, opts, B, dtype=jnp.float32,
                                iters_per_dispatch=4,
                                al_stall_rounds=2,   # bench default policy
                                log=lambda s: print(s, flush=True))
    res = run(x0s, us0)
    jax.block_until_ready(res.xs)
    return {"B": B, "T": T, "k": 4, "converged": int(res.converged.sum())}


def _r10_common(compact: bool):
    """Deploy defaults (slice cascade + AL inner-budget schedule, the
    round-4 bench winner) with compaction toggled — the on-chip A/B
    for the width-rounding caveat (VERDICT r3 #6): converged lane SETS
    are reported so divergence is visible, not just counts."""
    jax = _setup()
    import jax.numpy as jnp
    from optimization_dynamics_tpu.solver.ilqr_segmented import (
        make_segmented_solver)
    B, T = 128, 51
    prob, x0, us0, opts = _bench_problem(fused=True, T=T)
    key = jax.random.PRNGKey(0)
    x0s = (jnp.tile(x0, (B, 1))
           + 0.01 * jax.random.normal(key, (B, 4), jnp.float32))
    run = make_segmented_solver(prob, opts, B, dtype=jnp.float32,
                                max_iter_schedule=[15, 15, 25, 25, 30],
                                al_stall_rounds=2, compact=compact,
                                log=lambda s: print(s, flush=True))
    res = run(x0s, us0)
    jax.block_until_ready(res.xs)
    import numpy as np
    conv = np.flatnonzero(np.asarray(res.converged)).tolist()
    return {"B": B, "T": T, "compact": compact,
            "converged": len(conv), "converged_set": conv}


def r10_deploy_compact():
    return _r10_common(True)


def r11_deploy_nocompact():
    return _r10_common(False)


CONV_GATE = 0.9   # full-solve rungs must CONVERGE, not just run


def _gate(detail: str):
    """A rung that solves the deploy-target problem but converges <90% of
    its lanes is a FAILURE, not a pass (round-2 r8 recorded converged=0
    as ok=true and nobody chased it — VERDICT r2 weak #2)."""
    try:
        info = json.loads(detail)
    except (ValueError, TypeError):
        return True, detail
    if "converged" in info and "B" in info:
        frac = info["converged"] / max(info["B"], 1)
        if frac < CONV_GATE:
            return False, detail + "  [RAN BUT CONVERGED %.0f%% < %.0f%%]" \
                % (100 * frac, 100 * CONV_GATE)
    return True, detail


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    if args:
        fn = globals()[args[0]]
        t0 = time.perf_counter()
        info = fn()
        info["wall_s"] = round(time.perf_counter() - t0, 1)
        print("LADDER_OK " + json.dumps(info))
        return

    rungs = RUNGS
    for f in flags:
        if f.startswith("--rungs="):
            rungs = f.split("=", 1)[1].split(",")

    env = dict(os.environ)
    env["PYTHONPATH"] = HERE + os.pathsep + env.get("PYTHONPATH", "")
    path = os.path.join(HERE, "docs", "fault_ladder.json")
    results = {}
    if rungs is not RUNGS and os.path.exists(path):
        with open(path) as f:          # partial re-run: merge over prior
            results = json.load(f).get("results", {})
    for rung in rungs:
        t0 = time.perf_counter()
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), rung],
                capture_output=True, text=True,
                timeout=TIMEOUT_S.get(rung, DEFAULT_TIMEOUT_S), env=env)
            ok = "LADDER_OK" in out.stdout
            detail = ""
            if ok:
                detail = out.stdout.split("LADDER_OK", 1)[1].strip()
                ok, detail = _gate(detail)
            else:
                tail = (out.stderr or out.stdout)[-400:]
                detail = "rc=%d %s" % (out.returncode, tail.replace(
                    "\n", " ")[-300:])
            results[rung] = {"ok": ok, "detail": detail,
                             "wall_s": round(time.perf_counter() - t0, 1)}
        except subprocess.TimeoutExpired:
            results[rung] = {"ok": False, "detail": "timeout",
                             "wall_s": round(time.perf_counter() - t0, 1)}
        print("%-20s %s  (%.0fs)" % (
            rung, "PASS" if results[rung]["ok"] else "FAULT",
            results[rung]["wall_s"]), flush=True)
        # after a fault the TPU claim can linger; give it a beat
        if not results[rung]["ok"]:
            time.sleep(10)

    with open(path, "w") as f:
        json.dump({"ts": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
                   "results": results}, f, indent=1)
    print("\n| rung | result | wall | detail |")
    print("|---|---|---|---|")
    for rung in [r for r in RUNGS if r in results]:
        r = results[rung]
        print("| %s | %s | %.0fs | %s |" % (
            rung, "pass" if r["ok"] else "FAULT", r["wall_s"],
            r["detail"][:80]))


if __name__ == "__main__":
    main()
