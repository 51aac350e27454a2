"""Test configuration: force an 8-virtual-device CPU backend.

Multi-chip sharding is validated on a virtual CPU mesh (no TPU slice is
available in CI); the env vars must be set before jax initializes.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/tpu setting
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
