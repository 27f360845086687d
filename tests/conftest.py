"""Test configuration: CPU backend with a virtual 8-device mesh.

Multi-chip TPU hardware is not available in CI, so sharding tests run on
XLA's host platform with 8 virtual devices (SURVEY.md §4: "multi-chip tests
that run under a mocked mesh").  float64 is enabled so physics oracles
(Kepler energy conservation etc.) can be checked to tight tolerances; the
library itself is dtype-polymorphic and runs float32 on TPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin (sitecustomize) pre-sets jax_platforms="axon,cpu";
# the env var alone is too late, so force the config directly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True)
def _clear_capacity_memory():
    """Isolate tests from the driver's in-process capacity carry-forward
    (same-geometry runs inherit healed capacities — deliberate in
    production, surprising across unrelated tests)."""
    yield
    from nbody.driver import simulate

    simulate._CAPACITY_MEMORY.clear()
