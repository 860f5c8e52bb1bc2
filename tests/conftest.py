"""Test configuration: force CPU with 8 virtual devices.

This is the TPU-world substitute for "test multi-node without a cluster"
(SURVEY.md §4): all sharding/collective tests run on a simulated 8-device
mesh via --xla_force_host_platform_device_count.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize pins JAX_PLATFORMS=axon before conftest
# runs; override it post-import too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
