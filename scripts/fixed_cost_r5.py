"""Separate the fused-IP kernel's FIXED per-grid-step cost from the
marginal per-iteration cost: time fori(N) kernels at N in {5,10,20,40}
and B in {128, 1024}; fit time = a*blocks + b*blocks*N.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/fixed_cost_r5.py
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
    from optimization_dynamics_tpu.models import cartpole
    from optimization_dynamics_tpu.ops.pallas import fused_ip
    from optimization_dynamics_tpu.solver.interior_point import IPOptions

    model = cartpole.friction_model()
    aux = cartpole.CartpoleAux(h=0.05,
                               friction=jnp.asarray([0.35, 0.35],
                                                    jnp.float32))
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)

    def data(B):
        q1s = jnp.stack([
            2.0 * jax.random.normal(ks[0], (B,), jnp.float32),
            jnp.pi * jax.random.normal(ks[1], (B,), jnp.float32)],
            axis=1)
        q0s = q1s - 0.05 * jax.random.normal(ks[2], (B, 2), jnp.float32)
        us = 3.0 * jax.random.normal(ks[3], (B, 1), jnp.float32)
        thetas = jax.vmap(
            lambda a, b, u: model.theta_fn(a, b, u, aux))(q0s, q1s, us)
        z0s = jax.vmap(model.init_z)(q1s)
        return z0s, thetas

    for B in (128, 1024):
        z0s, thetas = data(B)
        xs, ys = [], []
        for N in (5, 10, 20, 40):
            opts = IPOptions(r_tol=3.0e-5, kappa_tol=1.0e-3,
                             max_iter=N, max_ls=8)
            solve = jax.jit(fused_ip.make_fused_ip_solver(
                model.residual, model.spec, opts, early_exit=False))
            sol = solve(z0s, thetas)
            jax.block_until_ready(sol.z)
            n = 20
            t0 = time.time()
            for _ in range(n):
                sol = solve(z0s, thetas)
                jax.block_until_ready(sol.z)
            ms = 1e3 * (time.time() - t0) / n
            xs.append(N)
            ys.append(ms)
            print("B=%4d N=%2d  %8.3f ms" % (B, N, ms), flush=True)
        import numpy as np
        b, a = np.polyfit(xs, ys, 1)
        blocks = B // 128
        print("B=%4d  fit: fixed %.3f ms (%.3f ms/block) + %.1f us/iter"
              " (%.1f us/iter/block)"
              % (B, a, a / blocks, 1e3 * b / blocks / 1,
                 1e3 * b / blocks), flush=True)


if __name__ == "__main__":
    main()
