"""Device-mesh scenario parallelism.

The reference is single-core sequential (SURVEY.md §2.5); here massive
scenario parallelism is first-class: any solver closure (an implicit step,
a whole AL-iLQR solve) vmaps over a scenario batch on one chip and shards
over a ``jax.sharding.Mesh`` across chips/hosts. The scenario axis is
embarrassingly parallel, so sharded execution rides ICI with no
collectives in the hot loop; reductions (convergence statistics) are tiny
``psum``-style all-reduces inserted by XLA at the end.

Multi-host: call ``jax.distributed.initialize()`` first; the same mesh
then spans hosts (DCN) with no code changes.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["scenario_mesh", "shard_scenarios", "sharded_map",
           "device_count", "convergence_summary", "quarantine",
           "merge_retry"]

SCENARIO_AXIS = "scenario"


def device_count() -> int:
    return len(jax.devices())


def scenario_mesh(n_devices: Optional[int] = None,
                  devices: Optional[Iterable] = None) -> Mesh:
    """1-D mesh over the scenario axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SCENARIO_AXIS,))


def shard_scenarios(mesh: Mesh, batch):
    """Place a pytree of batched arrays with the leading axis sharded
    across the mesh's scenario axis."""
    sharding = NamedSharding(mesh, PartitionSpec(SCENARIO_AXIS))
    return jax.device_put(batch, sharding)


def convergence_summary(converged, iterations=None):
    """Aggregate per-scenario solve status across a (sharded) batch.

    The build's failure-detection surface (SURVEY.md §5): solver failures
    are per-scenario flags; this reduces them to fleet statistics. Works on
    sharded arrays (XLA inserts the cross-device reductions).
    """
    import jax.numpy as jnp

    n = converged.shape[0]
    out = {
        "n_scenarios": n,
        "n_converged": int(jnp.sum(converged)),
        "fraction_converged": float(jnp.mean(converged.astype(jnp.float32))),
    }
    if iterations is not None:
        out["mean_iterations"] = float(jnp.mean(iterations))
        out["max_iterations"] = int(jnp.max(iterations))
    failed = quarantine(converged)
    if failed:
        out["failed_indices"] = failed[:32]
    return out


def quarantine(converged):
    """Indices of failed scenarios (host-side list).

    Per-scenario failure containment (SURVEY.md §5): lockstep batched
    solvers already freeze diverged lanes (NaN costs fail the Armijo
    check, regularization caps, the lane exits); this surfaces *which*
    lanes failed so sweeps can exclude them from aggregates or retry
    them (see examples/sweep.py's restart pass).
    """
    return np.nonzero(~np.asarray(converged))[0].tolist()


def merge_retry(res, res_retry):
    """Merge a retry pass into a batched result pytree: lanes that failed
    in ``res`` but converged in ``res_retry`` take the retry values.
    Both pytrees must share shapes and carry a boolean ``converged``
    leading-axis field."""
    import jax.numpy as jnp

    take = jnp.logical_and(jnp.logical_not(res.converged),
                           res_retry.converged)
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(
            take.reshape((-1,) + (1,) * (a.ndim - 1)), b, a),
        res, res_retry)


def sharded_map(fn: Callable, mesh: Mesh, out_specs=PartitionSpec(SCENARIO_AXIS)) -> Callable:
    """jit(vmap(fn)) with scenario-sharded inputs and outputs.

    ``fn`` operates on one scenario; the returned callable takes the
    batched pytree (leading axis = scenarios, divisible by mesh size) and
    runs it sharded across the mesh.
    """
    spec = NamedSharding(mesh, PartitionSpec(SCENARIO_AXIS))
    jvf = jax.jit(jax.vmap(fn))  # one jit wrapper, cached across calls

    def run(*args):
        args = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, spec), args)
        return jvf(*args)

    return run
