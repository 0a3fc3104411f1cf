"""Test harness: deterministic CPU backend with 8 virtual devices.

The reference has no automated tests (SURVEY.md section 4); the CPU-jax
backend is the deterministic "fake backend" we use to build the test pyramid
it lacks.  Multi-chip sharding logic runs on an 8-device virtual CPU mesh.

NOTE: pytest plugins (e.g. jaxtyping's) import jax BEFORE this conftest runs,
so setting JAX_PLATFORMS via os.environ here is too late — jax.config has
already captured the host's value (which may be a live TPU plugin).  We force
the platform through jax.config.update, which works as long as no backend has
been initialized yet, and assert the backend in a session fixture so a silent
fallback to real hardware can never skew test numerics again.
"""

import os

# still exported for any subprocesses tests may spawn
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _require_cpu_backend():
    assert jax.default_backend() == "cpu", (
        f"tests must run on the deterministic CPU backend, got "
        f"{jax.default_backend()} — a plugin initialized a hardware backend "
        f"before conftest could force CPU"
    )
    assert jax.device_count() == 8, (
        f"expected 8 virtual CPU devices for mesh tests, got {jax.device_count()}"
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
