"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require real TPU hardware; multi-chip sharding is validated on a
virtual CPU mesh per the project build rules (the driver separately dry-runs
the multi-chip path via `__graft_entry__.dryrun_multichip`).
"""

import os

# Hard override: the ambient environment points JAX at the axon TPU tunnel
# (JAX_PLATFORMS=axon), which makes every test compile remotely.  Tests always
# run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
