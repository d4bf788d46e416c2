"""Test configuration: force CPU platform with 8 virtual devices.

The ambient environment pins JAX_PLATFORMS=axon (a remote TPU tunnel) and the
axon plugin ignores the env var, so the platform must be forced through
jax.config.  Multi-device tests exercise real mesh sharding via XLA's
host-platform device-count simulation — the standard JAX trick for testing
pjit/shard_map layouts without hardware (the driver separately dry-runs the
multi-chip path).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
