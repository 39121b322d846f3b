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
# Isolated per-session compile cache: quatro_tpu.cli enables the
# persistent cache globally, and sharing /root/repo/.jax_cache with a
# concurrently-running TPU bench segfaulted a cache write mid-suite.
import tempfile  # noqa: E402
jax.config.update("jax_compilation_cache_dir",
                  tempfile.mkdtemp(prefix="jax_cache_test_"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
