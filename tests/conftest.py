"""Test harness config: force an 8-device virtual CPU mesh.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(`parallel/`) are exercised without TPU hardware, per the project test
strategy (SURVEY.md §4). Must run before jax is imported anywhere.
"""

import jax

# The container presets JAX_PLATFORMS=axon (remote TPU tunnel) via a
# sitecustomize hook that runs before conftest, so env-var overrides are too
# late — update the latched config instead, before any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
