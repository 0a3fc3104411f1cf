"""Test harness: deterministic CPU backend with 8 virtual devices.

The reference has no automated tests (SURVEY.md section 4); the CPU-jax
backend is the deterministic "fake backend" we use to build the test pyramid
it lacks.  Multi-chip sharding logic runs on an 8-device virtual CPU mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the host may preset a TPU plugin
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "all")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
