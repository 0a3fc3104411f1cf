"""Two-frame fusion invariants: the checks the reference only ever ran by
hand through its Checker dumps (SURVEY.md section 4):

  (a) per-stage count conservation: model_after = kept + new;
  (b) mark semantics: -10 invalid / -1 new / >=0 merge-target id;
  (c) back-mapping compaction preserves order and drops conf<=0;
  (d) byte-exact map checkpoint round-trip.
"""

import os

import numpy as np
import jax.numpy as jnp

from surfelmapping_tpu.config import CameraIntrinsics, MapConfig, PipelineParams
from surfelmapping_tpu.io.synthetic import SyntheticScene, tiny_cam
from surfelmapping_tpu.ops.fusion import compact
from surfelmapping_tpu.pipeline import SurfelMapper
from surfelmapping_tpu.surfels import (
    empty_map,
    load_map,
    pack_records,
    save_map,
    unpack_records,
)


def make_mapper(cam=None, capacity=1 << 16):
    cam = cam or tiny_cam()
    return SurfelMapper(cam, PipelineParams(), MapConfig(capacity=capacity))


def test_first_frame_creates_no_surfels():
    m = make_mapper()
    scene = SyntheticScene(m.cam)
    rgb, d, s, T = scene.frame(0)
    stats = m.process_frame(rgb, d, s, T)
    assert m.count == 0
    assert stats.get("first_frame")


def test_second_frame_populates_and_counts_conserve():
    m = make_mapper()
    scene = SyntheticScene(m.cam)
    for i in range(3):
        rgb, d, s, T = scene.frame(i)
        stats = m.process_frame(rgb, d, s, T)
    # conservation: count = previous - removed + new (merges don't change count)
    assert stats["count"] == m.count
    assert m.count > 0
    # model fills via the new-unstable path (reference behaviour with an
    # empty initial model, src/SurfelMapping.cpp:161-242)
    assert stats["new"] >= 0 and stats["removed"] >= 0


def test_count_conservation_across_frames():
    m = make_mapper()
    scene = SyntheticScene(m.cam)
    prev_count = 0
    for i in range(4):
        rgb, d, s, T = scene.frame(i)
        stats = m.process_frame(rgb, d, s, T)
        if i >= 1:
            assert stats["count"] == prev_count - stats["removed"] + stats["new"]
        prev_count = m.count


def test_surfels_within_world_bounds():
    """Fused surfels must lie on the synthetic scene geometry (ground plane /
    walls / car box), i.e. fusion preserves the world frame."""
    m = make_mapper()
    scene = SyntheticScene(m.cam)
    for i in range(3):
        rgb, d, s, T = scene.frame(i)
        m.process_frame(rgb, d, s, T)
    n = m.count
    smap = m.smap
    pos = np.asarray(smap.pos())[:n]
    sem = np.asarray(smap.sem())[:n]
    ground = sem == 0
    if ground.any():
        # ground plane at y = 1.6 (+/- smoothing tolerance)
        assert np.allclose(pos[ground, 1], scene.ground_y, atol=0.15)
    walls = sem == 2
    if walls.any():
        assert np.allclose(np.abs(pos[walls, 0]), scene.wall_x, atol=0.3)


def test_confidence_merge_growth():
    """Revisiting the same static surface with fuse_thresh > 0 must merge
    (confidence grows past conf_new) instead of duplicating."""
    cam = tiny_cam()
    params = PipelineParams(fuse_thresh_factor=0.05)
    m = SurfelMapper(cam, params, MapConfig(capacity=1 << 16))
    scene = SyntheticScene(cam, step=0.0)  # static camera
    for i in range(4):
        rgb, d, s, T = scene.frame(i)
        stats = m.process_frame(rgb, d, s, T)
    assert stats["merged"] > 0
    conf = np.asarray(m.smap.conf)[: m.count]
    assert conf.max() > params.conf_new * 2  # merged at least twice


def test_zero_fuse_thresh_never_merges_moving_camera():
    """Reference default fuse_thresh_factor = 0.0 makes the depth gate
    require EXACT float equality |dz|*lambda <= 0 (data.vert:151 with
    fuseThresh=0).  A moving camera resamples depth continuously, so no
    candidate can tie its target exactly: merged must be 0 every frame and
    every in-view association lands on the new-unstable (-1) or removed
    path instead."""
    m = make_mapper()
    scene = SyntheticScene(m.cam, step=0.5)
    total_merged = 0
    for i in range(4):
        rgb, d, s, T = scene.frame(i)
        stats = m.process_frame(rgb, d, s, T)
        if i >= 1:
            total_merged += int(stats["merged"])
            assert int(stats["new"]) > 0
    assert total_merged == 0


def test_compact_drops_nonpositive_conf_and_preserves_order():
    smap = empty_map(16)
    n = 6
    smap.px = smap.px.at[:n].set(jnp.arange(n, dtype=jnp.float32) * 3.0)
    smap.conf = smap.conf.at[:n].set(jnp.asarray([1.0, -0.1, 2.0, 0.0, 0.5, 3.0]))
    smap.count = jnp.int32(n)
    out = compact(smap)
    assert int(out.count) == 4
    kept = np.asarray(out.px[:4])
    assert list(kept) == [0.0, 6.0, 12.0, 15.0]
    # tail rows zeroed
    assert np.asarray(out.conf[4:]).sum() == 0


def test_map_checkpoint_roundtrip(tmp_path):
    m = make_mapper()
    scene = SyntheticScene(m.cam)
    for i in range(3):
        rgb, d, s, T = scene.frame(i)
        m.process_frame(rgb, d, s, T)
    path = os.path.join(tmp_path, "map.bin")
    save_map(m.smap, path, start_id=0, end_id=2)
    loaded, s0, s1 = load_map(path)
    assert (s0, s1) == (0, 2)
    assert int(loaded.count) == m.count
    # byte-exact record parity through the reference 12-float layout
    a = np.asarray(pack_records(m.smap))[: m.count]
    b = np.asarray(pack_records(loaded))[: int(loaded.count)]
    assert a.tobytes() == b.tobytes()
    # file header layout matches the reference format exactly
    raw = open(path, "rb").read()
    assert len(raw) == 12 + m.count * 48
    assert int(np.frombuffer(raw[:4], "<u4")[0]) == m.count


def test_capacity_growth_replays_frame():
    """Overflow must grow the buffer and lose nothing."""
    m = make_mapper(capacity=64)  # absurdly small
    scene = SyntheticScene(m.cam)
    for i in range(3):
        rgb, d, s, T = scene.frame(i)
        m.process_frame(rgb, d, s, T)
    assert m.count > 64
    assert m.smap.capacity > 64


def test_active_budget_overflow_is_replayed_exactly():
    """A too-small active-block budget must never silently truncate a frame's
    working set: the batched window verify (pipeline._repair_overflow) reads
    each frame's true active count at the next sync and replays the window
    with a grown budget, so the final map is identical to a run that never
    overflowed."""
    cam = tiny_cam()
    params = PipelineParams(fuse_thresh_factor=0.05, stereo_border=0.0)
    scene = SyntheticScene(cam, step=0.4)

    def run(active_blocks):
        m = SurfelMapper(
            cam, params,
            MapConfig(capacity=1 << 16, block_size=256,
                      active_blocks=active_blocks),
            sync_every=64,  # periodic sync never fires: only the probe guards
        )
        for i in range(8):
            rgb, d, s, T = scene.frame(i)
            m.process_frame(rgb, d, s, T)
        _ = m.count  # sync point: verifies the window and repairs overflows
        return m

    small = run(1)      # hopelessly under-budgeted: must grow via replay
    big = run(1024)     # never truncates
    assert small.active_blocks > 1, "budget never grew — repair did not fire"
    a, b = small.smap, big.smap
    assert int(a.count) == int(b.count)
    n = int(a.count)
    for col in ("px", "py", "pz", "conf", "colorsem", "init_t", "last_t",
                "nx", "ny", "nz", "radius"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, col)[:n]), np.asarray(getattr(b, col)[:n]),
            err_msg=f"column {col} diverged after budget-overflow replay",
        )


def test_local_model_lattice_order_parity():
    """genLSM parity (GlobalModel::getLocalSurfelModel,
    src/GlobalModel.cpp:1077-1176): every valid pixel becomes an unfused
    world-frame surfel, packed in the reference's uv COLUMN-MAJOR lattice
    order (u outer, v inner) — verified against an independent numpy
    reordering of the candidate images."""
    import jax

    from surfelmapping_tpu.ops.frame_surfels import association_candidates
    from surfelmapping_tpu.ops.preprocess import metricize_depth
    from surfelmapping_tpu.ops.transforms import transform_planar

    m = make_mapper()
    scene = SyntheticScene(m.cam)
    rgb, d, s, T = scene.frame(1)
    lm = m.local_model(rgb, d, s, T)

    # independent expectation: candidate images -> column-major valid pack
    depth_m = metricize_depth(
        jnp.asarray(np.asarray(d).astype(np.uint16)), m.cam, m.params
    )
    rgbf = jnp.asarray(np.asarray(rgb), jnp.float32) / 255.0
    fs = association_candidates(
        depth_m, rgbf, jnp.asarray(np.asarray(s).astype(np.int32)),
        m.cam, m.params,
    )
    wx, _, _ = transform_planar(
        jnp.asarray(T, jnp.float32), fs.px, fs.py, fs.pz
    )
    valid = np.asarray(fs.valid).T.reshape(-1)      # u outer, v inner
    exp_x = np.asarray(wx).T.reshape(-1)[valid]
    n = int(lm.count)
    assert n == int(valid.sum()) and n > 0
    np.testing.assert_allclose(np.asarray(lm.px)[:n], exp_x, rtol=1e-6)
    # nothing beyond the live prefix
    assert float(jnp.abs(lm.conf[n:]).max()) == 0.0
