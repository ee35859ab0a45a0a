"""TPU diagnostic: fused Pallas IP kernel vs XLA batched-native solver,
step-level parity on the bench configuration.

Round-2 observation: segmented+fused converged 20/256 lanes on the chip
while the same solver config (XLA dynamics) converges 16/16 on CPU-f32.
This script localizes the gap: solve the SAME batch of IP problems with
both paths on the real TPU and compare solutions, convergence flags,
and iteration counts — first from cold inits at perturbed states, then
along a swing-up-like control sweep.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/diag_fused_tpu.py
"""

from __future__ import annotations

import os

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
    import jax.numpy as jnp
    import numpy as np

    from optimization_dynamics_tpu.models import cartpole
    from optimization_dynamics_tpu.ops.pallas.fused_ip import (
        make_fused_ip_solver)
    from optimization_dynamics_tpu.solver.interior_point import (
        IPOptions, make_solver_batched)

    model = cartpole.friction_model()
    opts = IPOptions(r_tol=3.0e-5, kappa_tol=1.0e-3, max_iter=40,
                     max_ls=8)
    fused = make_fused_ip_solver(model.residual, model.spec, opts)
    xla = make_solver_batched(model.residual, model.spec, opts)
    aux = cartpole.CartpoleAux(h=0.05,
                               friction=jnp.asarray([0.35, 0.35],
                                                    jnp.float32))

    B = 128
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    # states spanning the swing-up envelope: positions +-1, angles
    # +-pi, velocity-scale differences q0 vs q1 up to 0.5*h
    q1s = jnp.stack([
        2.0 * jax.random.normal(ks[0], (B,), jnp.float32),
        jnp.pi * jax.random.normal(ks[1], (B,), jnp.float32)], axis=1)
    q0s = q1s - 0.05 * jax.random.normal(ks[2], (B, 2), jnp.float32)
    us = 3.0 * jax.random.normal(ks[3], (B, 1), jnp.float32)

    thetas = jax.vmap(lambda q0, q1, u: model.theta_fn(q0, q1, u, aux))(
        q0s, q1s, us)
    z0s = jax.vmap(model.init_z)(q1s)

    sol_f = jax.jit(fused)(z0s, thetas)
    sol_x = jax.jit(xla)(z0s, thetas)
    jax.block_until_ready(sol_f.z)
    jax.block_until_ready(sol_x.z)

    cf = np.asarray(sol_f.converged)
    cx = np.asarray(sol_x.converged)
    zf = np.asarray(sol_f.z)
    zx = np.asarray(sol_x.z)
    print("cold: fused converged %d/%d, xla %d/%d" %
          (cf.sum(), B, cx.sum(), B))
    both = cf & cx
    if both.any():
        dq = np.abs(zf[both][:, :2] - zx[both][:, :2]).max()
        print("cold: max |q2 diff| on co-converged: %.3e" % dq)
    only_x = (~cf) & cx
    if only_x.any():
        idx = np.nonzero(only_x)[0][:5]
        print("lanes converged on xla only:", idx.tolist())
        print("  fused r_vio:", np.asarray(sol_f.r_vio)[idx])
        print("  fused kappa_vio:", np.asarray(sol_f.kappa_vio)[idx])
        print("  fused iters:", np.asarray(sol_f.iterations)[idx])
        print("  xla iters:", np.asarray(sol_x.iterations)[idx])

    # warm re-solve: from the xla solution (the jac-sweep pattern)
    sol_fw = jax.jit(fused)(sol_x.z, thetas)
    sol_xw = jax.jit(xla)(sol_x.z, thetas)
    jax.block_until_ready(sol_fw.z)
    print("warm: fused converged %d/%d (mean iters %.1f), "
          "xla %d/%d (mean iters %.1f)" %
          (np.asarray(sol_fw.converged).sum(), B,
           np.asarray(sol_fw.iterations).mean(),
           np.asarray(sol_xw.converged).sum(), B,
           np.asarray(sol_xw.iterations).mean()))


if __name__ == "__main__":
    main()
