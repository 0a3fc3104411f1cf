"""Depth-map preprocessing: the reference's four fullscreen "compute" passes
re-expressed as fused jnp stencils over f32[H,W] arrays.

Reference pass order per frame (src/SurfelMapping.cpp:133-158,253-365):
  1. metricize   (depth_metric.frag)  u16 mm -> f32 m, clip + stereo border
  2. support     (depth_filter.frag, diffThresh=0.15)
  3. smooth      (depth_smooth.frag, 13x13 same-class Gaussian)
  4. support     (depth_filter.frag, diffThresh=0.1)
  5. movings     (depth_movings.frag) cull moving-object pixels vs last frame

All passes are pure functions image -> image; under jit XLA fuses the shifted
reads into a handful of HBM-bandwidth-bound loops (the GL version pays a full
texture round-trip + glFinish per pass).

Convention: pixel (row j, col i) has continuous coordinates x = i + 0.5,
y = j + 0.5, matching the reference's uv lattices (src/GlobalModel.cpp:66-73,
src/FeedbackBuffer.cpp:43-59).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics, PipelineParams


import numpy as np


def _inbounds_mask(H: int, W: int, dy: int, dx: int) -> jax.Array:
    """Static bool[H,W] mask: True where pixel (j+dy, i+dx) is in-bounds.
    Built in numpy so it constant-folds at trace time."""
    m = np.zeros((H, W), dtype=bool)
    m[max(0, -dy) : H - max(0, dy), max(0, -dx) : W - max(0, dx)] = True
    return jnp.asarray(m)


def _shift(img: jax.Array, dy: int, dx: int) -> tuple[jax.Array, jax.Array]:
    """Shifted view of a 2D image: out[j,i] = img[j+dy, i+dx].

    Returns (shifted, inbounds_mask).  Out-of-bounds reads return the
    clamped-edge value (GL_CLAMP_TO_EDGE texture semantics) but the mask
    records whether the source pixel was in-bounds so callers can reproduce
    the reference's explicit boundary `continue`s.

    Implemented as edge-pad + static slice (not gather) so XLA lowers each
    offset to a cheap fusable slice.
    """
    H, W = img.shape
    pj, pi = abs(dy), abs(dx)
    if pj == 0 and pi == 0:
        return img, jnp.asarray(np.ones((H, W), dtype=bool))
    padded = jnp.pad(img, ((pj, pj), (pi, pi)), mode="edge")
    shifted = jax.lax.slice(padded, (pj + dy, pi + dx), (pj + dy + H, pi + dx + W))
    return shifted, _inbounds_mask(H, W, dy, dx)


def metricize_depth(
    depth_raw_mm: jax.Array, cam: CameraIntrinsics, params: PipelineParams
) -> jax.Array:
    """u16 millimetre depth -> metric f32, zeroing out-of-range values and the
    left stereo margin (depth_metric.frag; uniforms src/SurfelMapping.cpp:254-266).
    """
    d = depth_raw_mm.astype(jnp.float32)
    lo = params.near_clip * 1000.0
    hi = (params.far_clip - 0.001) * 1000.0
    valid = (d > lo) & (d < hi)
    metric = jnp.where(valid, d / 1000.0, 0.0)
    cols = jnp.arange(cam.width, dtype=jnp.float32) + 0.5
    in_border = cols < params.stereo_border
    return jnp.where(in_border[None, :], 0.0, metric)


def support_filter(
    depth: jax.Array,
    semantic: jax.Array,
    params: PipelineParams,
    diff_thresh: float,
) -> jax.Array:
    """Keep a depth pixel only if >= 7 of its 8 neighbours are within
    ``diff_thresh`` and share its semantic class; zero sky/person/rider and
    out-of-range depths (depth_filter.frag, thresholds set at
    src/SurfelMapping.cpp:284,328)."""
    p = params
    removed = (
        (depth <= p.near_clip)
        | (depth >= p.filter_cap_depth)
        | (semantic == p.sky_class)
        | (semantic == p.person_class)
        | (semantic == p.rider_class)
    )
    support = jnp.zeros(depth.shape, jnp.int32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            dk, inb = _shift(depth, dy, dx)
            ck, _ = _shift(semantic, dy, dx)
            ok = inb & (jnp.abs(dk - depth) < diff_thresh) & (ck == semantic)
            support = support + ok.astype(jnp.int32)
    keep = (~removed) & (support >= p.filter_support_min)
    return jnp.where(keep, depth, 0.0)


def smooth_depth(
    depth: jax.Array,
    semantic: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
) -> jax.Array:
    """13x13 Gaussian smoothing restricted to same-class, in-range neighbours
    right of the stereo border; sky and out-of-range centers are zeroed
    (depth_smooth.frag; sigma quirk documented in PipelineParams)."""
    p = params
    removed = (
        (depth <= p.near_clip)
        | (depth >= p.filter_cap_depth)
        | (semantic == p.sky_class)
    )
    cols = jnp.arange(cam.width, dtype=jnp.float32) + 0.5
    # neighbour texX < stereoBorder/cols is skipped (depth_smooth.frag:51)
    col_ok = (cols >= p.stereo_border)[None, :] & jnp.ones(
        depth.shape, dtype=bool
    )
    sig = p.smooth_sig_pix
    R = p.smooth_radius
    num = jnp.zeros(depth.shape, jnp.float32)
    den = jnp.zeros(depth.shape, jnp.float32)
    cnt = jnp.zeros(depth.shape, jnp.int32)
    for dy in range(-R, R + 1):
        for dx in range(-R, R + 1):
            dk, inb = _shift(depth, dy, dx)
            ck, _ = _shift(semantic, dy, dx)
            cb, _ = _shift(col_ok, dy, dx)
            ok = (
                inb
                & cb
                & (dk > p.near_clip)
                & (dk < p.filter_cap_depth)
                & (ck == semantic)
            )
            w = math.exp(-((dy * dy + dx * dx) * sig))
            okf = ok.astype(jnp.float32)
            num = num + okf * dk * w
            den = den + okf * w
            cnt = cnt + ok.astype(jnp.int32)
    smoothed = jnp.where(cnt > 0, num / jnp.maximum(den, 1e-30), 0.0)
    return jnp.where(removed, 0.0, smoothed)


def remove_movings(
    depth: jax.Array,
    semantic: jax.Array,
    depth_last: jax.Array,
    T_curr_to_last: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
) -> jax.Array:
    """Cull pixels of movable classes whose reprojection into the previous
    frame disagrees with the previous depth by > move_thresh
    (depth_movings.frag; uniforms src/SurfelMapping.cpp:336-365)."""
    p = params
    H, W = depth.shape
    x = jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5
    y = jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5
    x = jnp.broadcast_to(x, (H, W))
    y = jnp.broadcast_to(y, (H, W))

    movable = (semantic >= p.movable_class_lo) & (semantic <= p.movable_class_hi)
    border_or_invalid = (x < p.stereo_border) | (depth <= p.near_clip)

    # reproject into the last frame
    X = (x - cam.cx) * depth / cam.fx
    Y = (y - cam.cy) * depth / cam.fy
    R = T_curr_to_last[:3, :3]
    t = T_curr_to_last[:3, 3]
    Xl = R[0, 0] * X + R[0, 1] * Y + R[0, 2] * depth + t[0]
    Yl = R[1, 0] * X + R[1, 1] * Y + R[1, 2] * depth + t[1]
    Zl = R[2, 0] * X + R[2, 1] * Y + R[2, 2] * depth + t[2]
    safe_z = jnp.where(jnp.abs(Zl) < 1e-12, 1e-12, Zl)
    ul = cam.fx * Xl / safe_z + cam.cx
    vl = cam.fy * Yl / safe_z + cam.cy

    out_of_last = (
        (Zl <= p.near_clip)
        | (Zl >= p.filter_cap_depth)
        | (ul < p.stereo_border)
        | (ul > W)
        | (vl < 0)
        | (vl > H)
    )

    # nearest-texel lookup of last depth at (ul, vl)
    ui = jnp.clip(jnp.floor(ul).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.floor(vl).astype(jnp.int32), 0, H - 1)
    d_last = depth_last[vi, ui]

    moving = jnp.abs(Zl - d_last) > p.move_thresh

    cull = movable & (~border_or_invalid) & (~out_of_last) & moving
    return jnp.where(cull, 0.0, depth)


import os as _os


def _use_pallas_stencil() -> bool:
    """The fused Pallas stencil kernel runs on real TPU backends only (the
    jnp path is the reference semantics everywhere else, including the
    deterministic CPU test backend).  SMTPU_NO_PALLAS=1 forces the jnp path
    for A/B debugging."""
    if _os.environ.get("SMTPU_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover - backend not initialized
        return False


def preprocess_frame(
    depth_raw_mm: jax.Array,
    semantic: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
) -> jax.Array:
    """Stages 1-4 (everything except movings, which needs the last frame).

    Returns the DEPTH_FILTERED image after the second support pass; it both
    becomes the next frame's LAST image (src/SurfelMapping.cpp:244) and, after
    :func:`remove_movings`, the fusion depth (the final METRIC texture).

    On TPU the three stencil passes run as one fused Pallas kernel
    (ops/pallas_preprocess.py) — same gates, float-reassociation-level
    differences only.
    """
    metric = metricize_depth(depth_raw_mm, cam, params)
    if _use_pallas_stencil():
        from .pallas_preprocess import preprocess_stencil_tpu

        return preprocess_stencil_tpu(metric, semantic, cam, params)
    filtered = support_filter(metric, semantic, params, params.filter_diff_thresh_1)
    smoothed = smooth_depth(filtered, semantic, cam, params)
    return support_filter(smoothed, semantic, params, params.filter_diff_thresh_2)
