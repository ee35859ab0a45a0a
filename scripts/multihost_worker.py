"""Multi-host (DCN) worker: one process of a 2-process CPU cluster.

Exercises the real multi-host code path promised in SURVEY.md §2.5 —
``jax.distributed.initialize`` + the same scenario mesh spanning
processes — on localhost CPU (the TPU-world fake backend for
distributed tests, SURVEY.md §4). Each process owns
``local_device_count`` virtual CPU devices; the global mesh spans both;
the batched cartpole-friction solve runs with the scenario axis sharded
across the processes, and the convergence reduction crosses the
process boundary.

Usage (spawned twice by tests/test_multihost.py):
  python scripts/multihost_worker.py <process_id> <num_processes> <port>
"""

from __future__ import annotations

import os
import sys


def main():
    pid, nproc, port = (int(a) for a in sys.argv[1:4])
    local_devices = 4

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
        local_device_ids=list(range(local_devices)),
    )
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc * local_devices

    from optimization_dynamics_tpu.examples import cartpole as ex
    from optimization_dynamics_tpu.parallel.mesh import scenario_mesh
    from optimization_dynamics_tpu.solver.ilqr_batched import solve_batched

    prob, x0, us0, opts = ex.build_problem("friction")
    # short-horizon slice: this test proves the DCN code path (global
    # mesh, cross-process sharding, collective reductions), not solve
    # quality — tests/test_examples_e2e.py owns that
    import dataclasses

    from optimization_dynamics_tpu.dynamics import make_implicit_dynamics
    from optimization_dynamics_tpu.models import cartpole
    aux = cartpole.CartpoleAux(h=ex.H,
                               friction=jnp.asarray([0.35, 0.35]))
    dyn = make_implicit_dynamics(cartpole.friction_model())
    T = 11
    prob = prob._replace(
        T=T,
        dynamics_batched=lambda t, xs, us: dyn.step_batched(xs, us, aux))
    opts = dataclasses.replace(opts, max_iter=4, max_al_iter=2)
    us0 = us0[:T - 1]

    mesh = scenario_mesh()                    # spans both processes
    B = len(jax.devices()) * 2
    sharding = NamedSharding(mesh, PartitionSpec("scenario"))

    # globally-sharded input: each process materializes its local shards
    rng = np.random.RandomState(0)
    x0s_host = np.tile(np.asarray(x0), (B, 1)) + 0.01 * rng.randn(B, 4)
    x0s = jax.make_array_from_callback(
        (B, 4), sharding, lambda idx: x0s_host[idx])

    run = jax.jit(lambda xs: solve_batched(prob, xs, us0, opts),
                  out_shardings=None)
    res = run(x0s)
    jax.block_until_ready(res.xs)

    # cross-process reduction: every process sees the same global stats
    n_finite = int(jnp.sum(jnp.all(jnp.isfinite(
        res.xs.reshape(B, -1)), axis=1)))
    assert n_finite == B, f"non-finite lanes: {B - n_finite}"
    assert len(res.xs.sharding.device_set) == nproc * local_devices
    print(f"MULTIHOST_OK pid={pid} devices={len(jax.devices())} "
          f"B={B} finite={n_finite}", flush=True)


if __name__ == "__main__":
    main()
