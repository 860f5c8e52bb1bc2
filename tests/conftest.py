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


# -- resource watch (diagnosing the late-suite XLA-CPU compile segfault) ----
# Prints fd/thread growth after any test that leaves more than the previous
# high-water mark. Cheap; keep until the crash mechanism is confirmed.
import threading as _threading

import pytest as _pytest

_HIGH = {"fd": 0, "th": 0}


@_pytest.fixture(autouse=True)
def _resource_watch(request):
    yield
    try:
        n_fd = len(os.listdir("/proc/self/fd"))
    except OSError:
        return
    n_th = _threading.active_count()
    import resource as _res

    rss_mb = _res.getrusage(_res.RUSAGE_SELF).ru_maxrss // 1024
    if (n_fd > _HIGH["fd"] or n_th > _HIGH["th"]
            or rss_mb > _HIGH.get("rss", 0) + 256):
        _HIGH["fd"] = max(_HIGH["fd"], n_fd)
        _HIGH["th"] = max(_HIGH["th"], n_th)
        _HIGH["rss"] = max(_HIGH.get("rss", 0), rss_mb)
        print(f"\n[resource] after {request.node.nodeid}: "
              f"fds={n_fd} threads={n_th} maxrss={rss_mb}MB", flush=True)
