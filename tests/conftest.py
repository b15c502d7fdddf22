"""Test configuration: CPU backend, 8 virtual devices, float64 enabled.

Tests run on CPU (the real TPU chip is reserved for benchmarks) with x64 so
the float64 oracle parity checks are meaningful, and with 8 virtual devices
so the multi-chip sharding paths are exercised without TPU hardware.
"""

import os

# NOTE: the axon TPU plugin force-sets JAX_PLATFORMS=axon at import time, so
# the env var alone is NOT enough — jax.config.update after import is what
# actually switches the backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    The full suite compiles several hundred distinct XLA:CPU programs in
    one process; past ~134 accumulated compilations the NEXT backend
    compile segfaults inside XLA (deterministic position, independent of
    which tests ran — any ~half of the suite is fine, the union is not).
    Dropping executables between modules keeps the per-process compile
    population bounded. Costs nothing across modules (programs are not
    shared between test files) and keeps `pytest tests/ -q` green."""
    yield
    jax.clear_caches()
