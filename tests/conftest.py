"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic can be
exercised without TPU hardware (the environment pins JAX_PLATFORMS=axon via
sitecustomize, so the platform must be forced through jax.config).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

RESOURCES = "/root/reference/tests/resources"


@pytest.fixture(scope="session")
def resources() -> str:
    if not os.path.isdir(RESOURCES):
        pytest.skip("reference test resources not available")
    return RESOURCES
