"""Test configuration: run on a virtual 8-device CPU mesh with float64.

This is the TPU-world "fake backend": multi-chip sharding is validated via
``--xla_force_host_platform_device_count`` without a pod, per SURVEY.md §4.
"""

import os

# Hard-override: the environment pins JAX_PLATFORMS=axon (single real TPU);
# tests must run on the virtual CPU mesh and never touch the chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
