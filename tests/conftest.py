"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; sharding tests run against
XLA's host-platform device partitioning (the standard JAX pattern for
testing pjit/shard_map logic without a pod slice).

Note: the environment's axon TPU shim force-sets ``jax_platforms="axon,cpu"``
at interpreter start, so setting JAX_PLATFORMS alone is not enough — we
override the config after import, before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()}, devices: {jax.device_count()}"
