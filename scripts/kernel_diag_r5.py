"""Locate the fused-IP kernel's per-iteration time: A/B kernel variants
at lanes=256 on the hard-cold cartpole batch.

  base     : deploy kernel (max_ls=8, early-exit while)
  ls2      : max_ls=2   (timing only — bounds the line-search share)
  ls1      : max_ls=1   (no backtracking at all)
  fori     : early_exit=False (fixed 40-iteration fori; bounds the
             while-loop's per-iteration overhead vs masked fori)
  reg0     : gamma_reg=0 (skips the J += reg*I eye materialization)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/kernel_diag_r5.py [lanes]
"""

import dataclasses
import os
import sys
import time

if "scoped_vmem" not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "")
        + " --xla_tpu_scoped_vmem_limit_kib=131072").strip()

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np
    from optimization_dynamics_tpu.models import cartpole
    from optimization_dynamics_tpu.ops.pallas import fused_ip
    from optimization_dynamics_tpu.solver.interior_point import IPOptions

    model = cartpole.friction_model()
    base = IPOptions(r_tol=3.0e-5, kappa_tol=1.0e-3, max_iter=40,
                     max_ls=8)
    aux = cartpole.CartpoleAux(h=0.05,
                               friction=jnp.asarray([0.35, 0.35],
                                                    jnp.float32))
    B = 1024
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    q1s = jnp.stack([
        2.0 * jax.random.normal(ks[0], (B,), jnp.float32),
        jnp.pi * jax.random.normal(ks[1], (B,), jnp.float32)], axis=1)
    q0s = q1s - 0.05 * jax.random.normal(ks[2], (B, 2), jnp.float32)
    us = 3.0 * jax.random.normal(ks[3], (B, 1), jnp.float32)
    thetas = jax.vmap(lambda a, b, u: model.theta_fn(a, b, u, aux))(
        q0s, q1s, us)
    z0s = jax.vmap(model.init_z)(q1s)

    variants = [
        ("base", base, True),
        ("ls2", dataclasses.replace(base, max_ls=2), True),
        ("ls1", dataclasses.replace(base, max_ls=1), True),
        ("fori", base, False),
        ("reg0", dataclasses.replace(base, gamma_reg=0.0), True),
    ]
    for name, o, ee in variants:
        solve = jax.jit(fused_ip.make_fused_ip_solver(
            model.residual, model.spec, o, early_exit=ee, lanes=L))
        t0 = time.time()
        sol = solve(z0s, thetas)
        jax.block_until_ready(sol.z)
        tc = time.time() - t0
        n = 10
        t0 = time.time()
        for _ in range(n):
            sol = solve(z0s, thetas)
            jax.block_until_ready(sol.z)
        cold = (time.time() - t0) / n
        iters = float(np.asarray(sol.iterations).mean())
        conv = int(np.asarray(sol.converged).sum())
        print("%-5s lanes=%d compile %5.1fs  cold %7.2f ms  mean_iters "
              "%5.1f  conv %d/%d  (us/iter/block ~ %.0f)"
              % (name, L, tc, 1e3 * cold, iters, conv, B,
                 1e6 * cold / max(iters, 1) / (B // L)), flush=True)


if __name__ == "__main__":
    main()
