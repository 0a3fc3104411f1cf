"""Per-stage profile of the active-block fusion step on the real TPU.

Each stage is jitted separately; a representative state is built first, then
each stage runs k times chained with a final host sync (the axon tunnel defers
execution until a transfer, so block_until_ready alone measures nothing).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from surfelmapping_tpu.config import MapConfig, PipelineParams
from surfelmapping_tpu.io.synthetic import SyntheticScene, kitti_cam
from surfelmapping_tpu.ops import active as A
from surfelmapping_tpu.ops.preprocess import preprocess_frame, remove_movings
from surfelmapping_tpu.ops.transforms import compose, invert_se3
from surfelmapping_tpu.pipeline import SurfelMapper


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    _ = float(jnp.sum(leaf.astype(jnp.float32) if leaf.dtype != jnp.float32 else leaf))


def timed(name, fn, *args, k=8):
    f = jax.jit(fn)
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(k)]
    for o in outs:
        _sync(o)
    dt = (time.perf_counter() - t0) / k * 1e3
    print(f"{name:28s} {dt:8.1f} ms", flush=True)
    return out


def main():
    cam = kitti_cam()
    params = PipelineParams()
    cfg = MapConfig(capacity=1 << 23, active_blocks=1024)
    mapper = SurfelMapper(cam, params, cfg, sync_every=16)
    scene = SyntheticScene(cam, step=0.8)
    frames = [mapper.stage_frame(*scene.frame(i)) for i in range(32)]
    for i in range(30):
        mapper.process_frame(*frames[i])
    _ = mapper.count
    smap = mapper._smap
    print(f"state: capacity={smap.capacity} tail={int(smap.count)} live={mapper._cached_count}")

    rgb, depth_raw, sem, pose = frames[30]
    last_depth = mapper.last_depth
    last_pose = mapper.last_pose
    time_t = jnp.float32(30.0)
    B = cfg.block_size
    AB = mapper._effective_active_blocks

    filtered = timed("preprocess_frame", lambda d, s: preprocess_frame(d, s, cam, params), depth_raw, sem)
    T_c2l = compose(invert_se3(last_pose), pose)
    depth_m = timed("remove_movings", lambda f, s, ld: remove_movings(f, s, ld, T_c2l, cam, params), filtered, sem, last_depth)
    T_inv = invert_se3(pose)

    blk, nov = timed("plan_active_blocks", lambda m: A.plan_active_blocks(m, T_inv, cam, params, AB, B), smap)
    print(f"  active blocks used: {int(jnp.sum(blk < smap.capacity // B))}/{AB} n_active={int(nov)}")
    at = timed("gather_active", lambda m, b: A.gather_active(m, b, B), smap, blk)
    at2, removed = timed(
        "conflict_active",
        lambda a, d, s: A.conflict_active(a, d, s, T_inv, cam, params, params.near_clip, params.far_clip, params.fuse_thresh_factor, False),
        at, depth_m, sem,
    )
    idx = timed("index_active", lambda a: A.index_active(a, T_inv, time_t, cam, params), at2)
    assoc = timed(
        "associate_active",
        lambda d, r, s, i, a: A.associate_active(d, r, s, i, a, pose, T_inv, time_t, cam, params),
        depth_m, rgb, sem, idx, at2,
    )
    at3 = timed("fuse_active", lambda a, asc: A.fuse_active(a, asc), at2, assoc)
    sm2 = timed("writeback_active", lambda m, a: A.writeback_active(m, a, B), smap, at3)
    sm3 = timed("append_flat", lambda m, asc: A.append_flat(m, asc)[0], sm2, assoc)
    _ = timed("live_count", lambda m: jnp.sum(m.conf > 0.0), sm3)


if __name__ == "__main__":
    main()
