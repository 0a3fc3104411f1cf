"""Per-pixel surfel candidate generation from a preprocessed frame.

Re-expresses the geometry of the reference's GLSL includes and feedback pass
as dense [H,W] array math (no stream compaction — validity stays a mask until
append time):

  * back-projection / central-difference normals: src/Shaders/geometry.glsl:5-24
  * radius model:                                 src/Shaders/surfels.glsl:19-32
  * feedback-buffer surfel creation + 1/2-sparse checkerboard:
                                                  src/Shaders/surfel_feedback.vert
  * the candidate half of the association kernel: src/Shaders/data.vert:59-113
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics, PipelineParams
from .preprocess import _shift
from .transforms import safe_normalize

SQRT2 = 1.41421356237


def pixel_grid(cam: CameraIntrinsics) -> tuple[jax.Array, jax.Array]:
    """Continuous pixel-center coordinates x=[H,W] (col+0.5), y=[H,W] (row+0.5)."""
    H, W = cam.height, cam.width
    x = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5, (H, W))
    y = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5, (H, W))
    return x, y


def backproject(depth: jax.Array, cam: CameraIntrinsics) -> jax.Array:
    """Depth image -> camera-frame vertex map f32[H,W,3]
    (geometry.glsl getVertex: X=(x-cx)z/fx, Y=(y-cy)z/fy, Z=z)."""
    x, y = pixel_grid(cam)
    X = (x - cam.cx) * depth / cam.fx
    Y = (y - cam.cy) * depth / cam.fy
    return jnp.stack([X, Y, depth], axis=-1)


def central_normals(depth: jax.Array, cam: CameraIntrinsics) -> jax.Array:
    """Central-difference normal map f32[H,W,3]
    (geometry.glsl getNormal float overload: n = normalize(cross(Vxb - Vxf,
    Vyb - Vyf))).

    Boundary pixels reproduce the GL texture clamp: the depth sample clamps
    to the edge texel while the unclamped pixel coordinate (x±1, y±1) is used
    for back-projection.
    """
    H, W = depth.shape
    x, y = pixel_grid(cam)

    def vertex_at(dy: int, dx: int) -> jax.Array:
        d, _ = _shift(depth, dy, dx)  # clamped depth sample
        xs = x + dx  # unclamped coordinate, as the shader passes x±1
        ys = y + dy
        return jnp.stack(
            [(xs - cam.cx) * d / cam.fx, (ys - cam.cy) * d / cam.fy, d], axis=-1
        )

    del_x = vertex_at(0, -1) - vertex_at(0, 1)
    del_y = vertex_at(-1, 0) - vertex_at(1, 0)
    return safe_normalize(jnp.cross(del_x, del_y))


def surfel_radius(depth: jax.Array, norm_z: jax.Array, cam: CameraIntrinsics) -> jax.Array:
    """Disc radius r = min(2*(z*sqrt2/meanFocal), (z*sqrt2/meanFocal)/|nz|)
    (surfels.glsl:19-32).  meanFocal = (fx+fy)/2 since the shader receives
    cam.zw = (1/fx, 1/fy)."""
    mean_focal = (cam.fx + cam.fy) / 2.0
    radius = depth * SQRT2 / mean_focal
    return jnp.minimum(2.0 * radius, radius / jnp.maximum(jnp.abs(norm_z), 1e-12))


def checkerboard(cam: CameraIntrinsics) -> jax.Array:
    """The reference's 1/2-sparse pixel mask (int(x)+int(y)) % 2 == 1
    (surfel_feedback.vert:39, data.vert:88)."""
    H, W = cam.height, cam.width
    r = jnp.arange(H, dtype=jnp.int32)[:, None]
    c = jnp.arange(W, dtype=jnp.int32)[None, :]
    return (r + c) % 2 == 1


def neighbours_nonzero(depth: jax.Array) -> jax.Array:
    """data.vert:33-52 checkNeighbours: all 4 axis neighbours have nonzero
    depth.  At image borders the GL sampler clamps to edge, so the clamped
    (= center-adjacent) texel is what gets tested — _shift reproduces that via
    its clamped value; the in-bounds mask is deliberately ignored here."""
    ok = jnp.ones(depth.shape, dtype=bool)
    for dy, dx in ((0, -1), (-1, 0), (0, 1), (1, 0)):
        d, _ = _shift(depth, dy, dx)
        ok = ok & (d != 0.0)
    return ok


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FrameSurfels:
    """Dense per-pixel candidate surfels in the CAMERA frame ([H,W] leaves)."""

    pos: jax.Array      # f32[H,W,3]
    normal: jax.Array   # f32[H,W,3]
    radius: jax.Array   # f32[H,W]
    conf: jax.Array     # f32[H,W]
    rgb: jax.Array      # f32[H,W,3]
    sem: jax.Array      # i32[H,W]
    valid: jax.Array    # bool[H,W]


def feedback_surfels(
    depth: jax.Array,
    rgb: jax.Array,
    semantic: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
) -> FrameSurfels:
    """The FeedbackBuffer pass (surfel_feedback.vert/.geom +
    src/FeedbackBuffer.cpp:85-145): camera-frame surfels for every valid
    pixel, validity = z>0 && z<maxDepth && checkerboard."""
    pos = backproject(depth, cam)
    normal = central_normals(depth, cam)
    radius = surfel_radius(depth, normal[..., 2], cam)
    valid = (depth > 0.0) & (depth < params.far_clip) & checkerboard(cam)
    return FrameSurfels(
        pos=pos,
        normal=normal,
        radius=radius,
        conf=jnp.full(depth.shape, params.conf_new, jnp.float32),
        rgb=rgb,
        sem=semantic.astype(jnp.int32),
        valid=valid,
    )


def association_candidates(
    depth: jax.Array,
    rgb: jax.Array,
    semantic: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
) -> FrameSurfels:
    """The candidate half of data.vert (lines 59-113): same geometry as
    feedback_surfels but with the stricter validity gate
    checkNeighbours && d>minDepth && d<maxDepth && checkerboard
    (data.vert:87-92)."""
    fs = feedback_surfels(depth, rgb, semantic, cam, params)
    valid = (
        neighbours_nonzero(depth)
        & (depth > params.near_clip)
        & (depth < params.far_clip)
        & checkerboard(cam)
    )
    return dataclasses.replace(fs, valid=valid)


def ray_geometry(cam: CameraIntrinsics) -> tuple[jax.Array, jax.Array]:
    """Per-pixel unit-plane ray (xl, yl, 1) and its length lambda
    (data.vert:65-71)."""
    x, y = pixel_grid(cam)
    xl = (x - cam.cx) / cam.fx
    yl = (y - cam.cy) / cam.fy
    lam = jnp.sqrt(xl * xl + yl * yl + 1.0)
    ray = jnp.stack([xl, yl, jnp.ones_like(xl)], axis=-1)
    return ray, lam
