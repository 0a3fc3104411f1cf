"""Unit tests for the depth preprocessing stencils against hand-computed
expectations (the reference has no tests; assertions encode the GLSL pass
semantics of depth_metric/filter/smooth/movings, SURVEY.md section 2b)."""

import numpy as np
import jax.numpy as jnp

from surfelmapping_tpu.config import CameraIntrinsics, PipelineParams
from surfelmapping_tpu.ops.preprocess import (
    metricize_depth,
    remove_movings,
    smooth_depth,
    support_filter,
)


def small_cam(W=32, H=24):
    return CameraIntrinsics(fx=30.0, fy=30.0, cx=W / 2, cy=H / 2, width=W, height=H)


def test_metricize_clips_and_borders():
    cam = small_cam(W=200, H=4)
    p = PipelineParams()
    raw = np.zeros((4, 200), np.uint16)
    raw[:, :] = 5000  # 5 m everywhere
    raw[0, 100] = 500  # 0.5 m -> below near clip (1 m)
    raw[1, 100] = 40000  # 40 m -> above far clip (30 m)
    out = np.asarray(metricize_depth(jnp.asarray(raw), cam, p))
    # left 80 columns zeroed
    assert (out[:, :80] == 0).all()
    assert np.isclose(out[2, 150], 5.0)
    assert out[0, 100] == 0.0
    assert out[1, 100] == 0.0
    # boundary: exactly 1000mm == near clip must be rejected (> not >=)
    raw2 = np.full((4, 200), 1000, np.uint16)
    out2 = np.asarray(metricize_depth(jnp.asarray(raw2), cam, p))
    assert (out2 == 0).all()


def test_support_filter_requires_7_of_8():
    cam = small_cam()
    p = PipelineParams()
    H, W = 9, 9
    d = np.full((H, W), 5.0, np.float32)
    s = np.zeros((H, W), np.int32)
    # center pixel with all 8 neighbours close -> kept
    out = np.asarray(support_filter(jnp.asarray(d), jnp.asarray(s), p, 0.15))
    assert out[4, 4] == 5.0
    # knock out 2 neighbours by depth difference -> only 6 support -> dropped
    d2 = d.copy()
    d2[3, 3] = 20.0
    d2[3, 4] = 20.0
    out2 = np.asarray(support_filter(jnp.asarray(d2), jnp.asarray(s), p, 0.15))
    assert out2[4, 4] == 0.0
    # knock out only 1 -> 7 support -> kept
    d3 = d.copy()
    d3[3, 3] = 20.0
    out3 = np.asarray(support_filter(jnp.asarray(d3), jnp.asarray(s), p, 0.15))
    assert out3[4, 4] == 5.0
    # semantic mismatch counts as no support
    s4 = s.copy()
    s4[3, 3] = 1
    s4[3, 4] = 1
    out4 = np.asarray(support_filter(jnp.asarray(d), jnp.asarray(s4), p, 0.15))
    assert out4[4, 4] == 0.0


def test_support_filter_removes_sky_person_rider():
    p = PipelineParams()
    d = np.full((5, 5), 5.0, np.float32)
    for cls in (10, 11, 12):
        s = np.full((5, 5), cls, np.int32)
        out = np.asarray(support_filter(jnp.asarray(d), jnp.asarray(s), p, 0.15))
        assert (out == 0).all()
    s = np.full((5, 5), 13, np.int32)  # car is NOT removed by the filter
    out = np.asarray(support_filter(jnp.asarray(d), jnp.asarray(s), p, 0.15))
    assert out[2, 2] == 5.0


def test_support_filter_border_pixels_fail():
    """Edge pixels have < 7 in-bounds neighbours so they always drop
    (the GLSL skips out-of-bounds texels, depth_filter.frag:52)."""
    p = PipelineParams()
    d = np.full((6, 6), 5.0, np.float32)
    s = np.zeros((6, 6), np.int32)
    out = np.asarray(support_filter(jnp.asarray(d), jnp.asarray(s), p, 0.15))
    assert (out[0, :] == 0).all() and (out[:, 0] == 0).all()
    assert (out[-1, :] == 0).all() and (out[:, -1] == 0).all()
    assert out[2, 2] == 5.0


def test_smooth_same_class_weighted_average():
    cam = small_cam(W=200, H=30)
    p = PipelineParams()
    H, W = 30, 200
    d = np.zeros((H, W), np.float32)
    s = np.zeros((H, W), np.int32)
    d[:, 100:140] = 5.0
    d[15, 120] = 5.5
    out = np.asarray(
        smooth_depth(jnp.asarray(d), jnp.asarray(s), cam, p)
    )
    # smoothing pulls the outlier toward 5.0 but not past it
    assert 5.0 < out[15, 120] < 5.5
    # zero-depth centers stay zero (<= minD)
    assert out[15, 50] == 0.0
    # sky centers are zeroed
    s2 = s.copy()
    s2[15, 120] = 10
    out2 = np.asarray(smooth_depth(jnp.asarray(d), jnp.asarray(s2), cam, p))
    assert out2[15, 120] == 0.0


def test_remove_movings_culls_inconsistent_car():
    cam = small_cam(W=200, H=30)
    p = PipelineParams()
    H, W = 30, 200
    depth = np.full((H, W), 10.0, np.float32)
    sem = np.zeros((H, W), np.int32)
    sem[:, 150:170] = 13  # car region
    # identity relative pose: reprojection hits the same pixel
    T = np.eye(4, dtype=np.float32)
    # last frame agrees -> keep
    last_same = depth.copy()
    out = np.asarray(
        remove_movings(
            jnp.asarray(depth), jnp.asarray(sem), jnp.asarray(last_same),
            jnp.asarray(T), cam, p,
        )
    )
    assert out[15, 160] == 10.0
    # last frame disagrees by > 0.5 m -> cull car pixels only
    last_diff = np.full((H, W), 12.0, np.float32)
    out2 = np.asarray(
        remove_movings(
            jnp.asarray(depth), jnp.asarray(sem), jnp.asarray(last_diff),
            jnp.asarray(T), cam, p,
        )
    )
    assert out2[15, 160] == 0.0
    assert out2[15, 100] == 10.0  # non-movable class kept
    # stereo border pixels are passed through untouched
    assert out2[15, 40] == 10.0
