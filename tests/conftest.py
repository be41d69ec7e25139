"""Test environment: CPU backend with 8 virtual devices (for mesh/sharding
tests without a pod — SURVEY.md §4), fp64 enabled for numerical-parity
oracles, persistent compilation cache to keep repeat runs fast."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# Force the CPU backend via jax.config (NOT the JAX_PLATFORMS env var: the
# host environment may pre-import jax with a TPU platform before conftest
# runs, in which case env vars are never re-read).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
