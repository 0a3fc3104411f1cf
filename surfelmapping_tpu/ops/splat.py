"""Novel-view surfel splatting: RGB / semantic / depth images from any pose.

TPU-native re-expression of the reference's rasterized quad-splat renderer
(draw_image.vert + draw_image_adaptive.geom + draw_image.frag,
src/GlobalModel.cpp:782-833).  The GL pipeline emits a camera-facing or
normal-oriented quad per surfel, interpolates a texcoord, and discards
fragments outside the unit disc.  Because each splat quad is planar,
perspective-correct interpolation of its texcoord equals a ray/plane
intersection — so the TPU renderer computes, for every pixel in a bounded
footprint around the projected surfel center, the exact intersection of the
pixel ray with the splat plane and applies the same inside-disc test.  The
z-buffer is the same two-pass scatter-argmin used by the index map.

Geometry reproduced from draw_image_adaptive.geom:
  * surfels with camera z > 5 m render as view-aligned discs of radius
    r*sqrt2 half-diagonal (lines 45-50);
  * nearer surfels render normal-oriented with foreshortened radius
    r / (1 + 0.5|cos angle|) (lines 51-60);
  * active gate 1 < z < maxDepth, maxDepth = 200 (GlobalModel.cpp:806);
  * color output is the surfel RGB, semantic output is class+1 with 0
    reserved for holes (draw_image_adaptive.geom:35).

Divergence (documented): GL interpolates depth screen-linearly across the
quad; we use the true geometric depth of the plane intersection.  For splats
a few pixels wide the difference is far below the z-buffer's discrimination
needs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics
from ..surfels import SurfelMap
from .index_map import INT32_MAX, _depth_key
from .transforms import invert_se3, rotate_vectors, safe_normalize, transform_points

SQRT2 = 1.41421356237


def _splat_frames(
    p: jax.Array, n: jax.Array, radius: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-surfel splat plane: returns (X axis, Y axis, plane normal), all
    f32[N,3], in the render camera frame."""
    z = p[:, 2]
    far_mode = z > 5.0

    # near (oriented) branch
    eye = p
    cosang = jnp.sum(eye * n, axis=-1) / jnp.maximum(
        jnp.linalg.norm(eye, axis=-1) * jnp.linalg.norm(n, axis=-1), 1e-12
    )
    rad_near = radius / (1.0 + 0.5 * jnp.abs(cosang))
    x_near = safe_normalize(
        jnp.stack([n[:, 1] - n[:, 2], -n[:, 0], n[:, 0]], axis=-1)
    ) * (rad_near * SQRT2)[:, None]
    y_near = jnp.cross(n, x_near)

    # far (view-aligned) branch: tmpNorm = (0,0,1)
    x_far = jnp.stack(
        [-jnp.ones_like(radius), jnp.zeros_like(radius), jnp.zeros_like(radius)],
        axis=-1,
    ) * (radius * SQRT2)[:, None]
    y_far = jnp.stack(
        [jnp.zeros_like(radius), -jnp.ones_like(radius), jnp.zeros_like(radius)],
        axis=-1,
    ) * (radius * SQRT2)[:, None]

    X = jnp.where(far_mode[:, None], x_far, x_near)
    Y = jnp.where(far_mode[:, None], y_far, y_near)
    plane_n = safe_normalize(jnp.cross(X, Y))
    return X, Y, plane_n


def splat_render(
    smap: SurfelMap,
    view: jax.Array,
    cam: CameraIntrinsics,
    max_depth: float = 200.0,
    footprint: int = 5,
) -> dict[str, jax.Array]:
    """Render the map from camera-to-world pose ``view``.

    Returns dict with:
      rgb:      f32[H,W,3] in [0,1] (0 where no surfel)
      semantic: i32[H,W]   class+1, 0 = hole (reference convention)
      depth:    f32[H,W]   camera-frame z of the winning splat, 0 = hole
      id:       i32[H,W]   winning surfel id, -1 = hole

    ``footprint`` bounds the per-surfel pixel radius; the reference's splats
    are <= ~4 px by construction of the radius model (surfels.glsl:19-32)
    at the mapping camera's focal length.
    """
    T_inv = invert_se3(view)
    H, W = cam.height, cam.width
    num_pix = H * W

    p = transform_points(T_inv, smap.pos)
    n = safe_normalize(rotate_vectors(T_inv, smap.normal))
    z = p[:, 2]
    active = smap.live_mask() & (z > 1.0) & (z < max_depth)

    X, Y, plane_n = _splat_frames(p, n, smap.radius)
    inv_x2 = 1.0 / jnp.maximum(jnp.sum(X * X, axis=-1), 1e-18)
    inv_y2 = 1.0 / jnp.maximum(jnp.sum(Y * Y, axis=-1), 1e-18)
    n_dot_p = jnp.sum(plane_n * p, axis=-1)

    safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    uc = cam.fx * p[:, 0] / safe_z + cam.cx
    vc = cam.fy * p[:, 1] / safe_z + cam.cy
    pi0 = jnp.floor(uc).astype(jnp.int32)
    pj0 = jnp.floor(vc).astype(jnp.int32)

    R = footprint
    offsets = [(dj, di) for dj in range(-R, R + 1) for di in range(-R, R + 1)]

    def offset_hit(dj: int, di: int):
        px = pi0 + di
        py = pj0 + dj
        # pixel ray through (px+0.5, py+0.5)
        dx = (px.astype(jnp.float32) + 0.5 - cam.cx) / cam.fx
        dy = (py.astype(jnp.float32) + 0.5 - cam.cy) / cam.fy
        denom = plane_n[:, 0] * dx + plane_n[:, 1] * dy + plane_n[:, 2]
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        t = n_dot_p / denom
        qx = t * dx - p[:, 0]
        qy = t * dy - p[:, 1]
        qz = t - p[:, 2]
        a = (qx * X[:, 0] + qy * X[:, 1] + qz * X[:, 2]) * inv_x2
        b = (qx * Y[:, 0] + qy * Y[:, 1] + qz * Y[:, 2]) * inv_y2
        inside = (a * a + b * b) <= 0.5
        inb = (px >= 0) & (px < W) & (py >= 0) & (py < H)
        ok = active & inside & inb & (t > 0.0) & (t < max_depth)
        flat = jnp.where(ok, py * W + px, num_pix)
        return flat, t, ok

    # pass 1: depth z-buffer
    depth_buf = jnp.full((num_pix,), INT32_MAX, jnp.int32)
    hits = []
    for dj, di in offsets:
        flat, t, ok = offset_hit(dj, di)
        key = _depth_key(t, ok)
        depth_buf = depth_buf.at[flat].min(key, mode="drop")
        hits.append((flat, key, ok))

    # pass 2: winner ids (ties -> smallest id, GL leaves ties to draw order)
    ids = jnp.arange(smap.capacity, dtype=jnp.int32)
    id_buf = jnp.full((num_pix,), INT32_MAX, jnp.int32)
    for flat, key, ok in hits:
        win = ok & (key == depth_buf[jnp.clip(flat, 0, num_pix - 1)])
        id_buf = id_buf.at[jnp.where(win, flat, num_pix)].min(ids, mode="drop")

    hole = id_buf == INT32_MAX
    wid = jnp.where(hole, 0, id_buf)
    rgb = jnp.where(hole[:, None], 0.0, smap.rgb[wid]).reshape(H, W, 3)
    sem = jnp.where(hole, 0, smap.sem[wid] + 1).reshape(H, W).astype(jnp.int32)
    depth_f = jax.lax.bitcast_convert_type(depth_buf, jnp.float32)
    depth_img = jnp.where(hole, 0.0, depth_f).reshape(H, W)
    id_img = jnp.where(hole, -1, id_buf).reshape(H, W)
    return {"rgb": rgb, "semantic": sem, "depth": depth_img, "id": id_img}
