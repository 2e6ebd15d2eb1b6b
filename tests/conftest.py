"""Test env: emulate an 8-device mesh on CPU so sharding/collective code is
exercised without TPU hardware (SURVEY.md §4 implication)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms to "axon,cpu", which would
# route every test op through the TPU tunnel (one network round trip per
# compile). Override it back to pure host CPU for the test suite.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/dev/shm/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
