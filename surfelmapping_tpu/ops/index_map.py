"""Projective index map: per-pixel argmin-depth surfel id (full-map form).

TPU-native replacement of the reference's depth-tested point render into a
4-attachment FBO (src/IndexMap.cpp:138-198, src/Shaders/index_map.vert/.frag).
The GL z-buffer is re-expressed as a two-pass scatter-argmin:

  1. scatter-min the (monotonically int-bitcast) depth of every active surfel
     into its pixel bin;
  2. surfels whose depth equals their pixel's min re-scatter their id with a
     min-reduce (ties resolve to the smallest id; GL resolves ties by draw
     order, which the reference never relies on).

This full-map form serves consumers that associate against the WHOLE map
(ICP refinement, the offline clean pass); the per-frame fusion pipeline uses
the active-table form (ops/active.py:index_active) so its cost tracks the
in-frustum working set.

The reference additionally renders camera-frame position/color/normal
attachments; on TPU consumers simply gather those attributes from the surfel
arrays by id (the texture mirror disappears), see :func:`gather_fields`.

Pixel convention: a point projected to continuous (u, v) lands in pixel
(ceil(u)-1, ceil(v)-1), the GL point-rasterization rule for size-1 points.
Empty pixels hold id -1; consumers must keep the reference's ``id > 0``
validity convention (index_map clear value is 0 there, making surfel 0
unmatchable: data.vert:142, conflict.geom:17 — we preserve that behaviour).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics, PipelineParams
from ..surfels import SurfelMap
from .transforms import normalize_planar, rotate_planar, transform_planar

INT32_MAX = jnp.iinfo(jnp.int32).max


def _depth_key(z: jax.Array, valid: jax.Array) -> jax.Array:
    """Monotonic int32 key for positive-float depth ordering; invalid -> MAX."""
    key = jax.lax.bitcast_convert_type(z.astype(jnp.float32), jnp.int32)
    return jnp.where(valid, key, INT32_MAX)


def scatter_argmin_image(
    flat_pix: jax.Array,
    z: jax.Array,
    valid: jax.Array,
    num_pixels: int,
) -> tuple[jax.Array, jax.Array]:
    """Generic z-buffer: returns (winner_id[num_pixels], depth_key[num_pixels]).

    ``flat_pix``: i32[N] flattened pixel index per element (any value ok where
    invalid). Winner id is the smallest element index among depth minimizers;
    empty pixels get id -1 and key INT32_MAX.
    """
    n = flat_pix.shape[0]
    key = _depth_key(z, valid)
    idx = jnp.where(valid, flat_pix, num_pixels)  # out-of-range -> dropped
    depth_buf = jnp.full((num_pixels,), INT32_MAX, jnp.int32)
    depth_buf = depth_buf.at[idx].min(key, mode="drop")
    win_key = depth_buf[jnp.clip(idx, 0, num_pixels - 1)]
    is_winner = valid & (key == win_key)
    ids = jnp.arange(n, dtype=jnp.int32)
    id_buf = jnp.full((num_pixels,), INT32_MAX, jnp.int32)
    id_buf = id_buf.at[jnp.where(is_winner, idx, num_pixels)].min(ids, mode="drop")
    id_buf = jnp.where(id_buf == INT32_MAX, -1, id_buf)
    return id_buf, depth_buf


def project_surfels(
    smap: SurfelMap, T_inv: jax.Array, cam: CameraIntrinsics
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Camera-frame planar positions + continuous projections of every slot.

    Returns (x, y, z, u, v), all f32[N].
    """
    x, y, z = transform_planar(T_inv, smap.px, smap.py, smap.pz)
    safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = cam.fx * x / safe_z + cam.cx
    v = cam.fy * y / safe_z + cam.cy
    return x, y, z, u, v


def build_index_map(
    smap: SurfelMap,
    T_inv: jax.Array,
    time: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
) -> jax.Array:
    """predictIndices (src/IndexMap.cpp:138-198): id image i32[H*F, W*F].

    Active-surfel gates (index_map.vert:45 + GL clipping/depth-test):
      z < maxDepth (clip+depth-range), z > 0, time - last_t <= timeDelta,
      0 <= pixel < image.  maxDepth = farClip; the shader's own 1.5*maxDepth
      gate is subsumed by the z/maxDepth depth-buffer clip.
    """
    factor = params.index_factor
    icam = cam.scaled(factor)
    H, W = icam.height, icam.width
    _, _, z, u, v = project_surfels(smap, T_inv, icam)
    # conf > 0 also excludes tombstoned surfels awaiting deferred compaction
    live = smap.live_mask() & (smap.conf > 0.0)
    fresh = (time - smap.last_t) <= params.time_delta
    pi = jnp.ceil(u).astype(jnp.int32) - 1
    pj = jnp.ceil(v).astype(jnp.int32) - 1
    inb = (pi >= 0) & (pi < W) & (pj >= 0) & (pj < H)
    valid = live & fresh & (z > 0.0) & (z < params.far_clip) & inb
    flat = pj * W + pi
    id_buf, _ = scatter_argmin_image(flat, z, valid, H * W)
    return id_buf.reshape(H, W)


def gather_fields(
    smap: SurfelMap, ids: jax.Array, T_inv: jax.Array
) -> dict[str, jax.Array]:
    """Gather camera-frame attributes of ``ids`` (i32[...]) from the map —
    the TPU equivalent of the reference's vertConf/colorTime/normRad index-map
    attachments (index_map.vert:61-63).  Caller must mask with its own
    validity; out-of-range ids clamp.

    Planar columns in/out; ``pos``/``normal`` keys are stacked [...,3] views
    for geometry consumers (ICP) — fine off the per-frame hot path.
    """
    safe = jnp.clip(ids, 0, smap.capacity - 1)
    x, y, z = transform_planar(T_inv, smap.px[safe], smap.py[safe], smap.pz[safe])
    nx, ny, nz = normalize_planar(
        *rotate_planar(T_inv, smap.nx[safe], smap.ny[safe], smap.nz[safe])
    )
    return {
        "pos": jnp.stack([x, y, z], axis=-1),
        "conf": smap.conf[safe],
        "colorsem": smap.colorsem[safe],
        "init_t": smap.init_t[safe],
        "normal": jnp.stack([nx, ny, nz], axis=-1),
        "radius": smap.radius[safe],
    }
