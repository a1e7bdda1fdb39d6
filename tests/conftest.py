"""Test configuration: force an 8-device virtual CPU mesh.

The TPU-world analogue of "test multi-node without a cluster" (SURVEY.md §4):
all tests run on CPU with 8 fake devices so sharding/collective code paths are
exercised without TPU hardware.

Must run before the first `import jax` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# this image's sitecustomize registers a TPU-tunnel backend and force-sets
# jax_platforms at interpreter boot; override it back to the CPU test mesh
jax.config.update("jax_platforms", "cpu")

# XLA-CPU compile times dominate the suite; persist compiled programs across
# test runs so only genuinely new computations pay the cost.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(2001)
