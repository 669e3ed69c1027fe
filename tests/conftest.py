"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the remote `axon` TPU backend and
forces JAX_PLATFORMS=axon; plain env overrides are ignored, so we force the
CPU platform through jax.config before any backend initializes. Multi-chip
sharding is validated on the CPU backend via
--xla_force_host_platform_device_count (no TPU pod needed); the real-TPU
path is exercised by bench.py and the driver's compile checks.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module. A full-suite run
    accumulates hundreds of jitted programs; the XLA CPU client has been seen
    to segfault under that memory pressure late in the session."""
    yield
    jax.clear_caches()
