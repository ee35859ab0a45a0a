"""Benchmark: contact-implicit solver throughput on one chip.

Headline metric per BASELINE.md north star: full cartpole-with-friction
iLQR solves/s (reference configuration T=51, friction 0.35). The round-1
TPU backend intermittently faults on large fused solver programs
(docs/DESIGN.md §6), so this harness tries variants in order, each in an
isolated subprocess (a device fault poisons the jax client):

  1. batched full solves (vmap B=64)       — the target metric;
  2. single full-solve latency             — same program, no vmap;
  3. batched implicit dynamics steps       — the innermost hot op.

Prints exactly one JSON line (the first variant that succeeds).
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import time

# XLA fusions around the fused Pallas solver slightly exceed the 16 MB
# default scoped-vmem budget (observed: 16.02M, a 24K overage). The
# backend build rotated mid-round-1: unknown flags in XLA_FLAGS now abort
# the *local* parser (F parse_flags_from_env), so the TPU-only flag must
# travel via LIBTPU_INIT_ARGS, which the axon remote-compile service
# snapshots and forwards. Must be set before backend init.
if "scoped_vmem" not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "")
        + " --xla_tpu_scoped_vmem_limit_kib=65536").strip()

HERE = os.path.dirname(os.path.abspath(__file__))
TARGET_PER_CHIP = 1000.0 / 16.0          # north-star solves/s per chip
STEPS_PER_SOLVE = 37000.0                # measured IP solves per full solve


def _setup_jax():
    import jax
    on_tpu = jax.default_backend() != "cpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(HERE, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    return jax, on_tpu


def _build(on_tpu: bool, dtype):
    import jax
    import jax.numpy as jnp

    from optimization_dynamics_tpu.dynamics import make_implicit_dynamics
    from optimization_dynamics_tpu.examples import cartpole as ex
    from optimization_dynamics_tpu.models import cartpole
    from optimization_dynamics_tpu.solver.interior_point import IPOptions

    prob, x0, us0, opts = ex.build_problem("friction", dtype=dtype)
    if on_tpu:
        model = cartpole.friction_model()
        aux = cartpole.CartpoleAux(
            h=ex.H, friction=jnp.asarray([0.35, 0.35], dtype))
        # ODX_BENCH_FUSED=0 falls back to the XLA batched-native path
        # (diagnostic: the fused kernel faults on some backend builds)
        fused = os.environ.get("ODX_BENCH_FUSED", "1") != "0"
        dyn = make_implicit_dynamics(
            model,
            eval_opts=IPOptions(r_tol=3.0e-5, kappa_tol=1.0e-3,
                                max_iter=40, max_ls=8),
            grad_opts=IPOptions(r_tol=3.0e-5, kappa_tol=1.0e-3,
                                max_iter=40, max_ls=8),
            fused=fused)  # lane-batched solves via the fused Pallas kernel
        prob = prob._replace(
            dynamics=lambda t, x, u: dyn.step(x, u, aux),
            dynamics_jac=lambda t, x, u: dyn.step_jac(x, u, aux),
            dynamics_jac_batched=lambda ts, xs, us: dyn.step_jac_batched(
                xs, us, aux),
            dynamics_batched=lambda t, xs, us: dyn.step_batched(
                xs, us, aux),
            dynamics_carry=lambda t, x, u, z: dyn.step_carry(z, x, u, aux),
            carry_init=dyn.carry_init,
            # same-timestep warm starts for the batched phases (~1 warm
            # Newton iteration vs ~20 cold in the line-search rollouts)
            dynamics_batched_ws=lambda t, xs, us, ws: dyn.step_batched_ws(
                xs, us, aux, ws),
            dynamics_jac_batched_ws=lambda ts, xs, us, wss:
                dyn.step_jac_batched_ws(xs, us, aux, wss),
            ws_init_batched=lambda t, xs, us: jax.vmap(dyn.carry_init)(xs))
        # f32: cap the AL penalty (rho past ~1e6 destroys f32 AL costs);
        # 8-candidate Armijo grid (alpha_min 1e-2) — plenty at con_tol
        # 0.01 and halves the line-search batch
        opts = dataclasses.replace(opts, con_tol=0.01, rho_max=1.0e6,
                                   alpha_min=1.0e-2)
    else:
        from optimization_dynamics_tpu.dynamics import (
            make_implicit_dynamics)
        from optimization_dynamics_tpu.models import cartpole
        aux = cartpole.CartpoleAux(
            h=ex.H, friction=jnp.asarray([0.35, 0.35], dtype))
        dyn = make_implicit_dynamics(cartpole.friction_model())
        prob = prob._replace(
            dynamics_batched=lambda t, xs, us: dyn.step_batched(
                xs, us, aux))
    return prob, x0, us0, opts


def variant_batched(B: int = 64):
    """Batched-native lockstep solver (no vmap-of-while; docs/DESIGN.md)."""
    jax, on_tpu = _setup_jax()
    import jax.numpy as jnp
    from optimization_dynamics_tpu.solver.ilqr_batched import solve_batched
    dtype = jnp.float32 if on_tpu else jnp.float64
    prob, x0, us0, opts = _build(on_tpu, dtype)
    if not on_tpu:
        B = 8
    key = jax.random.PRNGKey(0)
    x0s = (jnp.tile(x0.astype(dtype), (B, 1))
           + 0.01 * jax.random.normal(key, (B, 4), dtype))
    run = jax.jit(lambda xs: solve_batched(prob, xs, us0.astype(dtype),
                                           opts))
    res = run(x0s)
    jax.block_until_ready(res.xs)
    t0 = time.perf_counter()
    res = run(x0s)
    jax.block_until_ready(res.xs)
    dt = time.perf_counter() - t0
    v = B / dt
    return {
        "metric": ("cartpole-friction full iLQR solves/s "
                   "(1 chip, batch %d, %d/%d converged)"
                   % (B, int(jnp.sum(res.converged)), B)),
        "value": round(v, 3), "unit": "solves/s",
        "vs_baseline": round(v / TARGET_PER_CHIP, 4),
    }


def variant_segmented(B: int = 64):
    """Host-orchestrated phase programs (solver/ilqr_segmented.py): same
    math as the fused batched solve, but each phase jits separately —
    sized like the probe programs that are verified to run on this
    backend."""
    jax, on_tpu = _setup_jax()
    import jax.numpy as jnp
    from optimization_dynamics_tpu.solver.ilqr_segmented import (
        make_segmented_solver)
    dtype = jnp.float32 if on_tpu else jnp.float64
    prob, x0, us0, opts = _build(on_tpu, dtype)
    if not on_tpu:
        B = 8
    key = jax.random.PRNGKey(0)
    x0s = (jnp.tile(x0.astype(dtype), (B, 1))
           + 0.01 * jax.random.normal(key, (B, 4), dtype))
    run = make_segmented_solver(prob, opts, B, dtype=dtype)
    res = run(x0s, us0.astype(dtype))
    jax.block_until_ready(res.xs)
    t0 = time.perf_counter()
    res = run(x0s, us0.astype(dtype))
    jax.block_until_ready(res.xs)
    dt = time.perf_counter() - t0
    v = B / dt
    return {
        "metric": ("cartpole-friction full iLQR solves/s "
                   "(1 chip, segmented executor, batch %d, %d/%d converged)"
                   % (B, int(jnp.sum(res.converged)), B)),
        "value": round(v, 3), "unit": "solves/s",
        "vs_baseline": round(v / TARGET_PER_CHIP, 4),
    }


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
    v = 1.0 / dt
    return {
        "metric": ("cartpole-friction full iLQR solve latency, 1 chip, "
                   "unbatched (converged=%s)" % bool(res.converged)),
        "value": round(v, 3), "unit": "solves/s",
        "vs_baseline": round(v / TARGET_PER_CHIP, 4),
    }


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
    }


VARIANTS = ["batched", "segmented", "single", "steps"]


def main():
    if len(sys.argv) > 1:          # worker mode
        name = sys.argv[1]
        fn = {"batched": variant_batched, "segmented": variant_segmented,
              "single": variant_single, "steps": variant_steps}[name]
        print(json.dumps(fn()))
        return

    env = dict(os.environ)
    env["PYTHONPATH"] = HERE + os.pathsep + env.get("PYTHONPATH", "")
    last = None
    for name in VARIANTS:
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name],
                capture_output=True, text=True, timeout=2700, env=env)
            for line in out.stdout.strip().splitlines()[::-1]:
                line = line.strip()
                if line.startswith("{"):
                    print(line)
                    return
            last = out.stderr[-300:]
        except subprocess.TimeoutExpired:
            last = f"variant {name} timed out"
    print(json.dumps({
        "metric": "benchmark failed on all variants: %s" % (last or ""),
        "value": 0.0, "unit": "solves/s", "vs_baseline": 0.0,
    }))


if __name__ == "__main__":
    main()
