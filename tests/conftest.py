"""Test environment: force CPU with 8 virtual devices so sharding logic is
testable without a TPU pod (SURVEY.md §4 plan).  Must run before jax imports.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment variable alone is overridden by the axon TPU plugin in this
# image; the config update is authoritative.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped: each test gets a fresh, deterministic stream
    return np.random.default_rng(1234)
