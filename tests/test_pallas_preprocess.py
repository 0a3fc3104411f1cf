"""Interpret-mode parity test for the fused Pallas preprocess stencil.

The production ingest path runs ops/pallas_preprocess.py on any TPU backend
(preprocess.py:_use_pallas_stencil), so this suite pins its numerics against
the jnp reference chain (support_filter -> smooth_depth -> support_filter,
the exact depth_filter/depth_smooth.frag semantics) on the CPU interpret
backend.  Covers: odd image height (ragged last row band), stereo_border > 0,
semantic class boundaries, holes, and out-of-range depths.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from surfelmapping_tpu.config import CameraIntrinsics, PipelineParams
from surfelmapping_tpu.ops.pallas_preprocess import preprocess_stencil_tpu
from surfelmapping_tpu.ops.preprocess import smooth_depth, support_filter


def _jnp_chain(metric, semantic, cam, params):
    f1 = support_filter(metric, semantic, params, params.filter_diff_thresh_1)
    sm = smooth_depth(f1, semantic, cam, params)
    return support_filter(sm, semantic, params, params.filter_diff_thresh_2)


def _synthetic_frame(H, W, rng, border_classes=True):
    """Depth with smooth ramps + discontinuities, holes, and a class image
    with vertical/horizontal boundaries crossing the stencil windows."""
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    depth = 5.0 + 4.0 * np.sin(x / 37.0) + 0.002 * y * x / W
    # a step discontinuity (support filter must split it)
    depth[:, W // 2 :] += 3.0
    # holes and out-of-range pockets
    depth[rng.random((H, W)) < 0.03] = 0.0
    depth[rng.random((H, W)) < 0.01] = 150.0  # beyond filter_cap_depth
    depth[rng.random((H, W)) < 0.01] = 0.5    # below near_clip

    sem = np.zeros((H, W), np.int32)
    if border_classes:
        sem[:, : W // 3] = 1
        sem[H // 2 :, :] += 2
        # sprinkle removed classes (sky / person / rider)
        sem[: H // 8, 2 * W // 3 :] = 10
        sem[rng.random((H, W)) < 0.01] = 11
        sem[rng.random((H, W)) < 0.005] = 12
    return depth.astype(np.float32), sem


@pytest.mark.parametrize(
    "H,W,border",
    [
        (70, 200, 16.0),   # even H, small border
        (37, 200, 0.0),    # odd H -> ragged last band, no border
        (128, 328, 80.0),  # two full bands, reference stereo border
    ],
)
def test_pallas_matches_jnp_chain(H, W, border, rng):
    cam = CameraIntrinsics(fx=100.0, fy=100.0, cx=W / 2, cy=H / 2,
                           width=W, height=H)
    params = PipelineParams(stereo_border=border)
    depth, sem = _synthetic_frame(H, W, rng)
    metric = jnp.asarray(depth)
    semantic = jnp.asarray(sem)

    ref = _jnp_chain(metric, semantic, cam, params)
    got = preprocess_stencil_tpu(metric, semantic, cam, params, interpret=True)

    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0, atol=1e-4,
    )
    # the frame must be non-trivial: some pixels survive, some are zeroed
    kept = float(jnp.mean(ref > 0))
    assert 0.05 < kept < 0.999


def test_pallas_zero_and_uniform_frames(rng):
    """Degenerate inputs: all-hole frame stays all-hole; a uniform in-range
    plane passes the support gates everywhere right of the border."""
    H, W = 64, 200
    cam = CameraIntrinsics(fx=100.0, fy=100.0, cx=W / 2, cy=H / 2,
                           width=W, height=H)
    params = PipelineParams(stereo_border=8.0)

    zeros = jnp.zeros((H, W), jnp.float32)
    sem = jnp.zeros((H, W), jnp.int32)
    out = preprocess_stencil_tpu(zeros, sem, cam, params, interpret=True)
    assert float(jnp.max(jnp.abs(out))) == 0.0

    plane = jnp.full((H, W), 7.5, jnp.float32)
    ref = _jnp_chain(plane, sem, cam, params)
    got = preprocess_stencil_tpu(plane, sem, cam, params, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
