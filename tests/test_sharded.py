"""Multi-device sharding tests on the 8-device virtual CPU mesh: the sharded
fusion step must (a) compile and run, (b) produce the same total surfel count
and world geometry as the single-chip pipeline, and (c) balance shards."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from surfelmapping_tpu.config import MapConfig, PipelineParams
from surfelmapping_tpu.io.synthetic import SyntheticScene, tiny_cam
from surfelmapping_tpu.parallel.sharded import (
    AXIS,
    empty_sharded,
    make_sharded_step,
    state_sharding,
)
from surfelmapping_tpu.pipeline import SurfelMapper


def run_sharded(n_frames=3, n_devices=8, cap=1 << 14, cam=None):
    devices = np.array(jax.devices()[:n_devices])
    mesh = Mesh(devices, (AXIS,))
    cam = cam or tiny_cam(128, 64)
    params = PipelineParams()
    state = jax.device_put(empty_sharded(cap, n_devices), state_sharding(mesh))
    step = make_sharded_step(mesh, cam, params, n_devices)
    scene = SyntheticScene(cam)
    last_depth = jnp.zeros((cam.height, cam.width), jnp.float32)
    last_pose = jnp.asarray(scene.pose(0), jnp.float32)
    stats = None
    # frame 0 seeds LAST like the single-chip path
    rgb, d, s, T = scene.frame(0)
    from surfelmapping_tpu.ops.preprocess import preprocess_frame

    last_depth = preprocess_frame(
        jnp.asarray(d), jnp.asarray(s.astype(np.int32)), cam, params
    )
    for i in range(1, n_frames):
        rgb, d, s, T = scene.frame(i)
        state, last_depth, stats = step(
            state,
            jnp.asarray(d),
            jnp.asarray(rgb, jnp.float32) / 255.0,
            jnp.asarray(s.astype(np.int32)),
            jnp.asarray(T, jnp.float32),
            last_depth,
            last_pose,
            jnp.float32(i),
        )
        last_pose = jnp.asarray(T, jnp.float32)
    return state, stats, cam


def test_sharded_step_matches_single_chip_count():
    n_frames = 3
    cam = tiny_cam(128, 64)
    state, stats, _ = run_sharded(n_frames=n_frames, cam=cam)

    # single-chip run on the same frames
    m = SurfelMapper(cam, PipelineParams(), MapConfig(capacity=1 << 14))
    scene = SyntheticScene(cam)
    for i in range(n_frames):
        rgb, d, s, T = scene.frame(i)
        single = m.process_frame(rgb, d, s, T)

    assert int(stats["count"]) == m.count
    assert int(stats["new"]) == single["new"]
    assert int(stats["removed"]) == single["removed"]


def test_sharded_geometry_matches_single_chip():
    n_frames = 3
    cam = tiny_cam(128, 64)
    state, stats, _ = run_sharded(n_frames=n_frames, cam=cam)
    m = SurfelMapper(cam, PipelineParams(), MapConfig(capacity=1 << 14))
    scene = SyntheticScene(cam)
    for i in range(n_frames):
        rgb, d, s, T = scene.frame(i)
        m.process_frame(rgb, d, s, T)

    # same multiset of surfel positions (order differs across shards)
    from surfelmapping_tpu.parallel.sharded import gather_sharded_map

    merged = gather_sharded_map(state, 8)
    sharded_pos = np.asarray(merged.pos())[: int(merged.count)]
    smap = m.smap
    single_pos = np.asarray(smap.pos())[: m.count]
    assert sharded_pos.shape == single_pos.shape
    a = np.sort(np.round(sharded_pos, 4).view([("x", "f4"), ("y", "f4"), ("z", "f4")]), axis=0)
    b = np.sort(np.round(single_pos, 4).view([("x", "f4"), ("y", "f4"), ("z", "f4")]), axis=0)
    match = (a == b).mean()
    assert match > 0.99, f"only {match:.2%} of surfel positions match"


def test_shards_balanced():
    state, stats, _ = run_sharded(n_frames=4)
    counts = np.asarray(state.counts)  # per-shard tails (incl. tombstones)
    # live surfels per shard (removal is tombstoned, reclaimed lazily)
    S = state.px.shape[0] // 8
    conf = np.asarray(state.conf)
    live = np.array(
        [(conf[d * S : d * S + counts[d]] > 0).sum() for d in range(8)]
    )
    assert live.sum() == int(stats["count"])
    if live.sum() >= 8:
        assert live.max() - live.min() <= max(2, live.sum() // 8 // 2)


def test_sharded_mapper_long_run_parity_with_removals():
    """20-frame removal-heavy run through the ShardedMapper driver (growth,
    window verify, deferred compaction) vs the single-chip engine: identical
    live count, matching geometry multiset, dropped == 0 throughout — the
    'no surfel ever dropped' guarantee holds multi-chip."""
    from surfelmapping_tpu.parallel.sharded import ShardedMapper

    n_frames = 20
    n_dev = 8
    cam = tiny_cam(128, 64)
    # fuse_thresh 0 (reference default): ~half the in-view surfels conflict
    # out every frame -> exercises tombstones + compaction heavily
    params = PipelineParams(stereo_border=0.0)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), (AXIS,))
    # deliberately tiny so capacity growth triggers mid-run
    sm = ShardedMapper(
        mesh, cam, params, capacity=1 << 13, active_blocks=8,
        block_size=128, sync_every=4, compact_dead_frac=0.2,
    )
    single = SurfelMapper(
        cam, params, MapConfig(capacity=1 << 16), sync_every=4
    )
    scene = SyntheticScene(cam, step=0.6)
    for i in range(n_frames):
        rgb, d, s, T = scene.frame(i)
        sm.process_frame(rgb, d, s, T)
        single.process_frame(rgb, d, s, T)

    assert sm.count == single.count
    assert sm.capacity > 1 << 13, "growth never triggered — weak test"

    merged = sm.smap()
    smap = single.smap
    a = np.sort(
        np.round(np.asarray(merged.pos())[: int(merged.count)], 4).view(
            [("x", "f4"), ("y", "f4"), ("z", "f4")]
        ),
        axis=0,
    )
    b = np.sort(
        np.round(np.asarray(smap.pos())[: single.count], 4).view(
            [("x", "f4"), ("y", "f4"), ("z", "f4")]
        ),
        axis=0,
    )
    assert a.shape == b.shape
    match = (a == b).mean()
    assert match > 0.99, f"only {match:.2%} of surfel positions match"


def test_sharded_mapper_budget_overflow_replay():
    """An under-budgeted ShardedMapper must repair by window replay and end
    bit-identical to a generously-budgeted run."""
    from surfelmapping_tpu.parallel.sharded import ShardedMapper

    cam = tiny_cam(128, 64)
    # merging on -> surfels accumulate, so the per-shard active set outgrows
    # a 1-block budget within a few frames
    params = PipelineParams(stereo_border=0.0, fuse_thresh_factor=0.05)
    n_dev = 4

    def run(active_blocks):
        mesh = Mesh(np.array(jax.devices()[:n_dev]), (AXIS,))
        sm = ShardedMapper(
            mesh, cam, params, capacity=1 << 14, active_blocks=active_blocks,
            block_size=32, sync_every=8,
        )
        scene = SyntheticScene(cam, step=0.5)
        for i in range(8):
            rgb, d, s, T = scene.frame(i)
            sm.process_frame(rgb, d, s, T)
        sm._sync()
        return sm

    small = run(1)
    big = run(64)
    assert small.active_blocks > 1, "budget never grew — repair did not fire"
    assert small.count == big.count
    a = np.asarray(small.state.conf)
    b = np.asarray(big.state.conf)
    ca = np.asarray(small.state.counts)
    cb = np.asarray(big.state.counts)
    np.testing.assert_array_equal(ca, cb)
    S = small.state.px.shape[0] // n_dev
    for d in range(n_dev):
        np.testing.assert_array_equal(
            a[d * S : d * S + ca[d]], b[d * S : d * S + cb[d]]
        )
