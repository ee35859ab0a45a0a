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
           "device_count"]

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


def sharded_map(fn: Callable, mesh: Mesh, out_specs=PartitionSpec(SCENARIO_AXIS)) -> Callable:
    """jit(vmap(fn)) with scenario-sharded inputs and outputs.

    ``fn`` operates on one scenario; the returned callable takes the
    batched pytree (leading axis = scenarios, divisible by mesh size) and
    runs it sharded across the mesh.
    """
    spec = NamedSharding(mesh, PartitionSpec(SCENARIO_AXIS))
    vf = jax.vmap(fn)

    def run(*args):
        args = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, spec), args)
        return jax.jit(vf)(*args)

    return run
