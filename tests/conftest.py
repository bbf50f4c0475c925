"""Test harness: force an 8-device virtual CPU platform before jax imports.

The reference has no test suite at all (SURVEY.md §5); here multi-chip
sharding is exercised on any host via XLA's host-platform device-count trick.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The sandbox's sitecustomize force-registers the axon TPU plugin and sets
# jax_platforms="axon,cpu" AFTER env vars are read — re-select CPU here so
# tests run on the 8-device virtual host platform, not over the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/root/.jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
