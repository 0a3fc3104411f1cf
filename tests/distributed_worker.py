"""Worker script for tests/test_distributed.py — a real 2-process x
4-virtual-CPU-device multi-controller JAX job (run via
parallel.distributed.spawn_cpu_processes, NOT by pytest directly).

Exercises, across processes:
  1. jax.distributed.initialize via the env-var path;
  2. a psum over the global 8-device mesh (the DCN collective path);
  3. three frames of the block-sharded fusion step on the global mesh;
  4. the allgather_state + checkpoint gather on process 0.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from surfelmapping_tpu.parallel import distributed as D


def main() -> int:
    D.initialize()
    n_proc = jax.process_count()
    assert n_proc == int(os.environ["JAX_NUM_PROCESSES"]), (
        jax.process_count(), os.environ["JAX_NUM_PROCESSES"],
    )
    n_dev = len(jax.devices())
    mesh = D.fusion_mesh()

    # --- 1. global psum over all devices (DCN between the two processes) --
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    x = jnp.arange(n_dev, dtype=jnp.float32)
    total = jax.jit(
        shard_map(
            # psum result is identical on every device -> replicated output
            # (a P(AXIS)-sharded output would span non-addressable devices
            # and could not be fetched host-side)
            lambda v: jax.lax.psum(jnp.sum(v), D.AXIS),
            mesh=mesh, in_specs=P(D.AXIS), out_specs=P(),
        )
    )(x)
    expect = float(np.arange(n_dev).sum())
    got = float(total)
    assert got == expect, (got, expect)

    # --- 2. sharded fusion over the global mesh ---------------------------
    from jax.sharding import NamedSharding

    from surfelmapping_tpu.config import PipelineParams
    from surfelmapping_tpu.io.synthetic import SyntheticScene, tiny_cam
    from surfelmapping_tpu.parallel.sharded import (
        empty_sharded,
        make_sharded_step,
        state_sharding,
    )

    cam = tiny_cam(64, 32)
    params = PipelineParams(stereo_border=0.0)
    cap = 1 << 13
    block = 128
    state = jax.device_put(empty_sharded(cap, n_dev), state_sharding(mesh))
    step = make_sharded_step(
        mesh, cam, params, n_dev, active_blocks=4, block_size=block
    )
    scene = SyntheticScene(cam)
    last_depth = jnp.zeros((cam.height, cam.width), jnp.float32)
    last_pose = jnp.asarray(scene.pose(0))
    stats = None
    for i in range(1, 4):
        rgb, depth, sem, pose = scene.frame(i)
        state, last_depth, stats = step(
            state,
            jnp.asarray(depth),
            jnp.asarray(rgb, jnp.float32) / 255.0,
            jnp.asarray(sem.astype(np.int32)),
            jnp.asarray(pose),
            last_depth,
            last_pose,
            jnp.float32(i),
        )
        last_pose = jnp.asarray(pose)
    count = int(stats["count"])
    dropped = int(stats["dropped"])
    assert count > 0, "empty sharded map in distributed run"
    assert dropped == 0, f"{dropped} surfels dropped in distributed run"

    # --- 3. checkpoint gather across hosts --------------------------------
    import tempfile

    from surfelmapping_tpu.parallel.sharded import gather_sharded_map

    full = D.allgather_state(state)
    smap = gather_sharded_map(full, n_dev)
    assert int(smap.count) == count, (int(smap.count), count)
    if jax.process_index() == 0:
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "map.bin")
            D.save_checkpoint(state, n_dev, path)
            from surfelmapping_tpu.surfels import load_map

            loaded, _, _ = load_map(path)
            assert int(loaded.count) == count
    else:
        D.save_checkpoint(state, n_dev, "/dev/null")

    print(f"process {jax.process_index()}: OK count={count}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
