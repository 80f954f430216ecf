"""Test harness: force an 8-virtual-device CPU backend before jax init.

Multi-chip sharding tests run against a virtual CPU mesh
(`--xla_force_host_platform_device_count=8`), mirroring how the driver
dry-runs the multichip path. The session environment pins JAX_PLATFORMS=axon
(a real tunneled TPU); tests must be hermetic and fast, so we override to CPU.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running e2e tests")
