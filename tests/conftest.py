"""Test configuration: force the CPU backend with 8 virtual devices so
mesh/sharding/collective tests run without TPU hardware (SURVEY.md §4.4).

Must run before jax is imported anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# persistent compile cache: first full run is slow on 1 CPU core, repeats are fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize force-sets jax_platforms="axon,cpu"
# at interpreter start, overriding JAX_PLATFORMS env — override it back so
# tests run on the 8-virtual-device CPU backend.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
