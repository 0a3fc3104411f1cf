"""Per-pixel surfel candidate generation from a preprocessed frame.

Re-expresses the geometry of the reference's GLSL includes and feedback pass
as dense [H,W] array math (no stream compaction — validity stays a mask until
append time):

  * back-projection / central-difference normals: src/Shaders/geometry.glsl:5-24
  * radius model:                                 src/Shaders/surfels.glsl:19-32
  * feedback-buffer surfel creation + 1/2-sparse checkerboard:
                                                  src/Shaders/surfel_feedback.vert
  * the candidate half of the association kernel: src/Shaders/data.vert:59-113

All vector quantities are PLANAR (separate [H,W] component images): XLA pads
trailing-3 arrays to 128 lanes (42.7x memory/traffic — see surfels.py), so
[H,W,3] stacks are banned from the frame path.  Color+semantics travel as one
bit-packed [H,W] float (ops/colors.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics, PipelineParams
from .colors import encode_color
from .preprocess import _shift

SQRT2 = 1.41421356237


def pixel_grid(cam: CameraIntrinsics) -> tuple[jax.Array, jax.Array]:
    """Continuous pixel-center coordinates x=[H,W] (col+0.5), y=[H,W] (row+0.5)."""
    H, W = cam.height, cam.width
    x = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5, (H, W))
    y = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5, (H, W))
    return x, y


def backproject(depth: jax.Array, cam: CameraIntrinsics):
    """Depth image -> camera-frame vertex component images (X, Y, Z), each
    f32[H,W] (geometry.glsl getVertex: X=(x-cx)z/fx, Y=(y-cy)z/fy, Z=z)."""
    x, y = pixel_grid(cam)
    X = (x - cam.cx) * depth / cam.fx
    Y = (y - cam.cy) * depth / cam.fy
    return X, Y, depth


def central_normals(depth: jax.Array, cam: CameraIntrinsics):
    """Central-difference normal component images (nx, ny, nz), each f32[H,W]
    (geometry.glsl getNormal float overload: n = normalize(cross(Vxb - Vxf,
    Vyb - Vyf))).

    Boundary pixels reproduce the GL texture clamp: the depth sample clamps
    to the edge texel while the unclamped pixel coordinate (x±1, y±1) is used
    for back-projection.
    """
    x, y = pixel_grid(cam)

    def vertex_at(dy: int, dx: int):
        d, _ = _shift(depth, dy, dx)  # clamped depth sample
        xs = x + dx  # unclamped coordinate, as the shader passes x±1
        ys = y + dy
        return (xs - cam.cx) * d / cam.fx, (ys - cam.cy) * d / cam.fy, d

    lx, ly, lz = vertex_at(0, -1)
    rx, ry, rz = vertex_at(0, 1)
    ux, uy, uz = vertex_at(-1, 0)
    dx_, dy_, dz_ = vertex_at(1, 0)
    ax, ay, az = lx - rx, ly - ry, lz - rz          # del_x
    bx, by, bz = ux - dx_, uy - dy_, uz - dz_       # del_y
    cx = ay * bz - az * by
    cy = az * bx - ax * bz
    cz = ax * by - ay * bx
    n = jnp.maximum(jnp.sqrt(cx * cx + cy * cy + cz * cz), 1e-12)
    return cx / n, cy / n, cz / n


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
    """Dense per-pixel candidate surfels in the CAMERA frame (planar [H,W]
    leaves; colorsem carries packed color+class)."""

    px: jax.Array
    py: jax.Array
    pz: jax.Array
    nx: jax.Array
    ny: jax.Array
    nz: jax.Array
    radius: jax.Array
    conf: jax.Array
    colorsem: jax.Array
    sem: jax.Array       # i32[H,W] (kept unpacked: the association gate reads it)
    valid: jax.Array     # bool[H,W]


def feedback_surfels(
    depth: jax.Array,
    rgb: jax.Array,
    semantic: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
) -> FrameSurfels:
    """The FeedbackBuffer pass (surfel_feedback.vert/.geom +
    src/FeedbackBuffer.cpp:85-145): camera-frame surfels for every valid
    pixel, validity = z>0 && z<maxDepth && checkerboard.

    ``rgb`` is f32[H,W,3] in [0,1] straight from IO; it is bit-packed with
    the class id here (color.glsl encodeColor quantization) and never
    travels stacked again."""
    px, py, pz = backproject(depth, cam)
    nx, ny, nz = central_normals(depth, cam)
    radius = surfel_radius(depth, nz, cam)
    sem = semantic.astype(jnp.int32)
    valid = (depth > 0.0) & (depth < params.far_clip) & checkerboard(cam)
    return FrameSurfels(
        px=px, py=py, pz=pz,
        nx=nx, ny=ny, nz=nz,
        radius=radius,
        conf=jnp.full(depth.shape, params.conf_new, jnp.float32),
        colorsem=encode_color(rgb, sem.astype(jnp.uint32)),
        sem=sem,
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


def ray_geometry(cam: CameraIntrinsics):
    """Per-pixel unit-plane ray components (xl, yl) and length lambda
    (data.vert:65-71); the z component is identically 1."""
    x, y = pixel_grid(cam)
    xl = (x - cam.cx) / cam.fx
    yl = (y - cam.cy) / cam.fy
    lam = jnp.sqrt(xl * xl + yl * yl + 1.0)
    return xl, yl, lam
