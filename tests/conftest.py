"""Test harness: force CPU with 8 virtual devices.

Multi-chip hardware is unavailable in CI; all sharding tests run on a
virtual 8-device CPU mesh (SURVEY.md §4 test strategy). Must run before
any jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU-tunnel plugin (sitecustomize) overrides jax_platforms
# programmatically, which beats the env var — override it back.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
