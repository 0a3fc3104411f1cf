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

All per-surfel math is planar (component columns) — see surfels.py for why
(N,3) stacks are banned on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics
from ..surfels import SurfelMap
from .colors import decode_color
from .index_map import INT32_MAX, _depth_key
from .transforms import invert_se3, normalize_planar, rotate_planar, transform_planar

SQRT2 = 1.41421356237


def _splat_frames(px, py, pz, nx, ny, nz, radius):
    """Per-surfel splat plane: returns (X axis, Y axis, plane normal) as
    planar component triples, in the render camera frame."""
    far_mode = pz > 5.0

    # near (oriented) branch
    dot_en = px * nx + py * ny + pz * nz
    elen = jnp.sqrt(px * px + py * py + pz * pz)
    nlen = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    cosang = dot_en / jnp.maximum(elen * nlen, 1e-12)
    rad_near = radius / (1.0 + 0.5 * jnp.abs(cosang))
    # x_near = normalize((n.y - n.z, -n.x, n.x)) * rad_near*sqrt2
    ax, ay, az = normalize_planar(ny - nz, -nx, nx)
    sn = rad_near * SQRT2
    xnx, xny, xnz = ax * sn, ay * sn, az * sn
    # y_near = cross(n, x_near)
    ynx = ny * xnz - nz * xny
    yny = nz * xnx - nx * xnz
    ynz = nx * xny - ny * xnx

    # far (view-aligned) branch: X = (-1,0,0)*r*sqrt2, Y = (0,-1,0)*r*sqrt2
    sf = radius * SQRT2
    Xx = jnp.where(far_mode, -sf, xnx)
    Xy = jnp.where(far_mode, 0.0, xny)
    Xz = jnp.where(far_mode, 0.0, xnz)
    Yx = jnp.where(far_mode, 0.0, ynx)
    Yy = jnp.where(far_mode, -sf, yny)
    Yz = jnp.where(far_mode, 0.0, ynz)

    # plane normal = normalize(cross(X, Y))
    pnx, pny, pnz = normalize_planar(
        Xy * Yz - Xz * Yy, Xz * Yx - Xx * Yz, Xx * Yy - Xy * Yx
    )
    return (Xx, Xy, Xz), (Yx, Yy, Yz), (pnx, pny, pnz)


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

    px, py, pz = transform_planar(T_inv, smap.px, smap.py, smap.pz)
    nx, ny, nz = normalize_planar(*rotate_planar(T_inv, smap.nx, smap.ny, smap.nz))
    # conf > 0 also excludes tombstoned surfels awaiting deferred compaction
    active = smap.live_mask() & (smap.conf > 0.0) & (pz > 1.0) & (pz < max_depth)

    (Xx, Xy, Xz), (Yx, Yy, Yz), (pnx, pny, pnz) = _splat_frames(
        px, py, pz, nx, ny, nz, smap.radius
    )
    inv_x2 = 1.0 / jnp.maximum(Xx * Xx + Xy * Xy + Xz * Xz, 1e-18)
    inv_y2 = 1.0 / jnp.maximum(Yx * Yx + Yy * Yy + Yz * Yz, 1e-18)
    n_dot_p = pnx * px + pny * py + pnz * pz

    safe_z = jnp.where(jnp.abs(pz) < 1e-12, 1e-12, pz)
    uc = cam.fx * px / safe_z + cam.cx
    vc = cam.fy * py / safe_z + cam.cy
    pi0 = jnp.floor(uc).astype(jnp.int32)
    pj0 = jnp.floor(vc).astype(jnp.int32)

    R = footprint
    offsets = [(dj, di) for dj in range(-R, R + 1) for di in range(-R, R + 1)]

    def offset_hit(dj: int, di: int):
        qpx = pi0 + di
        qpy = pj0 + dj
        # pixel ray through (px+0.5, py+0.5)
        dx = (qpx.astype(jnp.float32) + 0.5 - cam.cx) / cam.fx
        dy = (qpy.astype(jnp.float32) + 0.5 - cam.cy) / cam.fy
        denom = pnx * dx + pny * dy + pnz
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        t = n_dot_p / denom
        qx = t * dx - px
        qy = t * dy - py
        qz = t - pz
        a = (qx * Xx + qy * Xy + qz * Xz) * inv_x2
        b = (qx * Yx + qy * Yy + qz * Yz) * inv_y2
        inside = (a * a + b * b) <= 0.5
        inb = (qpx >= 0) & (qpx < W) & (qpy >= 0) & (qpy < H)
        ok = active & inside & inb & (t > 0.0) & (t < max_depth)
        flat = jnp.where(ok, qpy * W + qpx, num_pix)
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
    w_rgb, w_sem = decode_color(smap.colorsem[wid])
    rgb = jnp.where(hole[:, None], 0.0, w_rgb).reshape(H, W, 3)
    sem = jnp.where(hole, 0, w_sem.astype(jnp.int32) + 1).reshape(H, W)
    depth_f = jax.lax.bitcast_convert_type(depth_buf, jnp.float32)
    depth_img = jnp.where(hole, 0.0, depth_f).reshape(H, W)
    id_img = jnp.where(hole, -1, id_buf).reshape(H, W)
    return {"rgb": rgb, "semantic": sem, "depth": depth_img, "id": id_img}
