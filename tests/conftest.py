"""Test configuration: force an 8-virtual-device CPU backend.

Multi-chip sharding is validated on a virtual CPU mesh.  The container's
sitecustomize registers a TPU (axon) PJRT backend at interpreter start,
so we must override the platform selection *and* clear any
already-initialized backends before tests import jax-using modules.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()
except Exception:  # pragma: no cover - version-dependent internals
    pass

jax.config.update("jax_threefry_partitionable", True)
assert jax.device_count() >= 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()}"
)
