"""Test env: force CPU with 8 virtual devices so multi-chip sharding tests run
anywhere (the JAX analogue of a fake backend).

Note: this environment pre-imports jax at interpreter startup and sets
JAX_PLATFORMS=axon, so plain env vars are too late — we must go through
jax.config. XLA_FLAGS is still read at (lazy) backend init, which hasn't
happened yet when conftest runs.
"""
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache_cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:  # persistent compile cache: a cold CI box warms up across runs
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
