"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require real TPU hardware; multi-chip sharding is validated on a
virtual CPU mesh per the project build rules (the driver separately dry-runs
the multi-chip path via `__graft_entry__.dryrun_multichip`).

The ambient environment registers the axon TPU plugin via sitecustomize and
explicitly calls `jax.config.update("jax_platforms", "axon,cpu")`, which
overrides the JAX_PLATFORMS env var - so we must update jax.config here, not
just the environment.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
