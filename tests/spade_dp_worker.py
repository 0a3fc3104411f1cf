"""Worker for test_data_parallel_sharded_jit_matches_single_device.

Runs in its own process: the sharded-jit SPADE G/D compile triggers an XLA
CPU compiler SEGFAULT when issued after ~55 other tests' compilations in
one process (jax accumulated-state bug; the same code passes standalone),
so the test isolates it subprocess-style like tests/test_distributed.py.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from surfelmapping_tpu.models.pix2pix import (
    SpadeConfig,
    SpadeTrainer,
    shard_batch,
)


def main():
    cfg = SpadeConfig(
        ngf=8, ndf=8, crop_size=32, use_vgg=False, num_d=1, n_layers_d=2
    )
    tr = SpadeTrainer(cfg, seed=0)
    rng = np.random.default_rng(2)
    label = jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 3)), jnp.float32)
    real = jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 3)), jnp.float32)
    state = tr.init_state(label, real)

    # single-device reference step
    s1, dlogs1 = tr.d_step(state, label, real)
    s1, glogs1 = tr.g_step(s1, label, real)

    # sharded: batch split over the data axis, params replicated
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    rep = jax.device_put(state, NamedSharding(mesh, P()))
    slab, sreal = shard_batch(mesh, (label, real))
    s8, dlogs8 = tr.d_step(rep, slab, sreal)
    s8, glogs8 = tr.g_step(s8, slab, sreal)

    assert float(jnp.abs(dlogs1["d_total"] - dlogs8["d_total"])) < 1e-4
    assert float(jnp.abs(glogs1["g_total"] - glogs8["g_total"])) < 1e-4
    maxdiff = 0.0
    for a, b in zip(jax.tree.leaves(s1.g_params), jax.tree.leaves(s8.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
        maxdiff = max(maxdiff, float(jnp.abs(a - b).max()))
    print(f"OK maxdiff={maxdiff:.2e} devices={len(jax.devices())}")


if __name__ == "__main__":
    main()
