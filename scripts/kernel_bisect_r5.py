"""Bisect the fused-IP kernel's per-iteration cost via ablation
variants under a FIXED 20-iteration fori (timing independent of
convergence; results are numerically meaningless, only wall matters).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/kernel_bisect_r5.py
"""

import dataclasses
import os
import time

if "scoped_vmem" not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "")
        + " --xla_tpu_scoped_vmem_limit_kib=131072").strip()

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
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
    opts = IPOptions(r_tol=3.0e-5, kappa_tol=1.0e-3, max_iter=20,
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

    variants = ["", "nols", "nores", "noqr,nojac,nobound",
                "nols,noqr,nojac,nobound", "nores,noqr,nobound"]
    base_ms = None
    for abl in variants:
        solve = jax.jit(fused_ip.make_fused_ip_solver(
            model.residual, model.spec, opts, early_exit=False,
            _ablate=abl))
        sol = solve(z0s, thetas)
        jax.block_until_ready(sol.z)
        n = 10
        t0 = time.time()
        for _ in range(n):
            sol = solve(z0s, thetas)
            jax.block_until_ready(sol.z)
        ms = 1e3 * (time.time() - t0) / n
        if base_ms is None:
            base_ms = ms
        # 20 fixed iters x 8 blocks
        print("%-22s %8.2f ms  (%5.0f us/iter/block, saves %5.1f%%)"
              % (abl or "full", ms, 1e3 * ms / 20 / 8,
                 100 * (1 - ms / base_ms)), flush=True)


if __name__ == "__main__":
    main()
