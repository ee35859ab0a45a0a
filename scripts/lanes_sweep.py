"""On-chip sweep: fused-IP kernel throughput vs lanes-per-block.

The round-5 rollout A/B showed the kernel itself (not glue) costs
~4.3 ms per 128-lane cold solve block — ~290 us per Newton iteration,
~100x the raw vector-op estimate, i.e. per-op fixed overhead dominates
at (nz<=35, 128) shapes. Wider lane blocks amortize that overhead:
this sweep measures cold+warm solves/s at L in {128..1024} on the
cartpole deploy shape.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/lanes_sweep.py
"""

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
    from optimization_dynamics_tpu.ops.pallas.fused_ip import (
        make_fused_ip_solver)
    from optimization_dynamics_tpu.solver.interior_point import IPOptions

    model = cartpole.friction_model()
    opts = IPOptions(r_tol=3.0e-5, kappa_tol=1.0e-3, max_iter=40,
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

    for L in (128, 256, 512, 1024):
        solve = jax.jit(make_fused_ip_solver(model.residual, model.spec,
                                             opts, lanes=L))
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
        zw = sol.z
        t0 = time.time()
        for _ in range(n):
            solw = solve(zw, thetas)
            jax.block_until_ready(solw.z)
        warm = (time.time() - t0) / n
        conv = int(np.asarray(sol.converged).sum())
        print("lanes=%4d  compile %6.1fs  cold %7.2f ms (%8.0f "
              "solves/s)  warm %7.2f ms (%8.0f solves/s)  conv %d/%d"
              % (L, tc, 1e3 * cold, B / cold, 1e3 * warm, B / warm,
                 conv, B), flush=True)


if __name__ == "__main__":
    main()
