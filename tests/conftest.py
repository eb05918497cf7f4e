"""Test configuration: run all tests on a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4 test-strategy note).

Note: this image preloads jax with JAX_PLATFORMS=axon via sitecustomize, so
the env var is already consumed by the time conftest runs; we must switch
the platform through jax.config instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
