"""Test configuration: force the XLA CPU backend with 8 virtual devices.

This lets every test — including multi-chip sharding tests — run without TPU
hardware. The same code jit-compiles unchanged on TPU.
"""

import os
import sys

# Must be set before the first jax backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container's sitecustomize registers a TPU plugin and forces
# jax_platforms=axon; override it back to CPU for the test suite.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
