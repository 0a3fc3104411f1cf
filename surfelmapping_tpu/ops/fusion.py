"""Full-map passes: free-space conflict, compaction, first-frame init.

TPU-native re-expressions of the reference's transform-feedback / FBO-scatter
stages on the planar SoA map (the model-map texture mirror of
src/GlobalModel.cpp:639-681 does not exist here):

  * conflict_pass:   conflict.vert/.geom + update_conf.vert/.frag
                     (src/GlobalModel.cpp:396-515) over the WHOLE map —
                     used by the offline cleanPoints replay; the per-frame
                     pipeline runs the same math on the in-frustum active
                     table instead (ops/active.py:conflict_active)
  * compact:         back_map.vert/.geom (src/GlobalModel.cpp:517-579)
                     — stream compaction via prefix-sum scatter; the per-
                     frame pipeline defers this (tombstones) and the host
                     invokes it at sync/checkpoint/growth boundaries
  * initialize_map:  init_unstable.vert (src/GlobalModel.cpp:191-244)

The per-frame fuse/append scatters live in ops/active.py (active-table
forms); round 1's full-capacity fuse_scatter/append_new were superseded.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics, PipelineParams
from ..surfels import SurfelMap
from .frame_surfels import FrameSurfels
from .transforms import normalize_planar, rotate_planar, transform_planar


def conflict_pass(
    smap: SurfelMap,
    depth: jax.Array,
    semantic: jax.Array,
    T_inv: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
    min_depth: float,
    max_depth: float,
    fuse_thresh: float,
    is_clean: bool,
) -> jax.Array:
    """Free-space violation test per surfel (conflict.vert) over the whole
    map.

    Returns the updated confidence array (conf - 1 where the surfel floats in
    front of the current measurement).  Gates and special depths follow
    conflict.vert:35-73; the conflict.geom:17 ``id > 0`` filter exempts
    surfel 0, reproduced here.
    """
    p = params
    H, W = cam.height, cam.width
    x, y, z = transform_planar(T_inv, smap.px, smap.py, smap.pz)
    safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    xl = x / safe_z
    yl = y / safe_z
    u = cam.fx * xl + cam.cx
    v = cam.fy * yl + cam.cy

    in_view = (
        (u >= p.stereo_border)
        & (u <= W)
        & (v >= 0)
        & (v <= H)
        & (z > min_depth)
        & (z < max_depth)
    )

    lam = jnp.sqrt(xl * xl + yl * yl + 1.0)

    # nearest-texel sample at texcoord (u/cols, v/rows), clamped to edge;
    # sky/hole substitutions folded into the image first so only one
    # per-surfel gather is paid (conflict.vert:49-58 semantics)
    hole = depth if is_clean else jnp.where(depth == 0.0, max_depth + 20.0, depth)
    deff = jnp.where(semantic == p.sky_class, max_depth + 1.0, hole)
    ui = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 1)
    d = deff.reshape(-1)[vi * W + ui]

    violates = (d * lam - z * lam) > (fuse_thresh * z)

    ids = jnp.arange(smap.capacity, dtype=jnp.int32)
    hit = smap.live_mask() & (smap.conf > 0.0) & (ids > 0) & in_view & violates
    return jnp.where(hit, smap.conf - p.conflict_conf_decrement, smap.conf)


def compact(smap: SurfelMap, prefix: int | None = None) -> SurfelMap:
    """Back-mapping compaction: drop rows with conf <= 0, preserve order
    (back_map.geom keeps conf > 0, src/GlobalModel.cpp:517-579).  The
    persisted mark column resets to 0 there; marks are not stored in the SoA
    map so nothing to reset.

    ``prefix`` (static) restricts the scatters to the first ``prefix``
    slots: every written slot lives below the allocation cursor, so a
    pow2 bucket >= tail compacts identically at a fraction of the cost (the
    full-capacity form scattered 11 x capacity elements — ~1.4 s at a 16 M
    allocation on TPU, THE mid-run throughput dip of BENCH_r04; the caller
    picks the bucket host-side, see pipeline._compact_now)."""
    cap = smap.capacity
    if prefix is None or prefix >= cap:
        keep = smap.live_mask() & (smap.conf > 0.0)
        dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
        new_count = jnp.maximum(dest[-1] + 1, 0).astype(jnp.int32)
        idx = jnp.where(keep, dest, cap)  # dropped -> out of range

        def scat(src):
            return jnp.zeros_like(src).at[idx].set(src, mode="drop")

        return SurfelMap(
            px=scat(smap.px), py=scat(smap.py), pz=scat(smap.pz),
            conf=scat(smap.conf),
            colorsem=scat(smap.colorsem),
            init_t=scat(smap.init_t), last_t=scat(smap.last_t),
            nx=scat(smap.nx), ny=scat(smap.ny), nz=scat(smap.nz),
            radius=scat(smap.radius),
            count=new_count,
        )

    def head(a):
        return jax.lax.slice_in_dim(a, 0, prefix)

    conf_h = head(smap.conf)
    keep = (
        jnp.arange(prefix, dtype=jnp.int32) < smap.count
    ) & (conf_h > 0.0)
    dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
    new_count = jnp.maximum(dest[-1] + 1, 0).astype(jnp.int32)
    idx = jnp.where(keep, dest, prefix)

    def scat(src):
        packed = jnp.zeros((prefix,), src.dtype).at[idx].set(
            head(src), mode="drop"
        )
        return jax.lax.dynamic_update_slice_in_dim(src, packed, 0, axis=0)

    # NOTE on the suffix: slots >= prefix are beyond the allocation cursor
    # (prefix >= tail) and were never written — they are already zeros, so
    # overwriting only the head keeps the invariant.
    return SurfelMap(
        px=scat(smap.px), py=scat(smap.py), pz=scat(smap.pz),
        conf=scat(smap.conf),
        colorsem=scat(smap.colorsem),
        init_t=scat(smap.init_t), last_t=scat(smap.last_t),
        nx=scat(smap.nx), ny=scat(smap.ny), nz=scat(smap.nz),
        radius=scat(smap.radius),
        count=new_count,
    )


def _column_major_flat(a: jax.Array) -> jax.Array:
    """Flatten [H,W,...] in column-major pixel order (col*H + row) — the
    reference's uv-lattice order (src/GlobalModel.cpp:66-73), so appended
    surfels receive identical ids."""
    return jnp.swapaxes(a, 0, 1).reshape((-1,) + a.shape[2:])


def initialize_map(
    smap: SurfelMap, frame: FrameSurfels, pose: jax.Array, time: jax.Array | float = 0.0
) -> tuple[SurfelMap, jax.Array]:
    """First-map initialization from a feedback-buffer frame: world-transform
    every valid camera-frame surfel and write it into the (empty) map
    (init_unstable.vert + GlobalModel::initialize).

    Returns (map, n_dropped).  Uses the same column-major pixel order as the
    reference's feedback lattice (src/FeedbackBuffer.cpp:43-59).
    """
    wx, wy, wz = transform_planar(pose, frame.px, frame.py, frame.pz)
    wnx, wny, wnz = normalize_planar(*rotate_planar(pose, frame.nx, frame.ny, frame.nz))

    valid = _column_major_flat(frame.valid)
    offs = jnp.cumsum(valid.astype(jnp.int32)) - 1
    n_new = jnp.maximum(offs[-1] + 1, 0)
    dest = smap.count + offs
    ok = valid & (dest < smap.capacity)
    idx = jnp.where(ok, dest, smap.capacity)

    def app(dst, src):
        return dst.at[idx].set(_column_major_flat(src), mode="drop")

    time_img = jnp.full(frame.conf.shape, time, jnp.float32)
    appended = jnp.minimum(n_new, jnp.maximum(smap.capacity - smap.count, 0))
    new_map = dataclasses.replace(
        smap,
        px=app(smap.px, wx), py=app(smap.py, wy), pz=app(smap.pz, wz),
        conf=app(smap.conf, frame.conf),
        colorsem=app(smap.colorsem, frame.colorsem),
        init_t=app(smap.init_t, time_img),
        last_t=app(smap.last_t, time_img),
        nx=app(smap.nx, wnx), ny=app(smap.ny, wny), nz=app(smap.nz, wnz),
        radius=app(smap.radius, frame.radius),
        count=smap.count + appended,
    )
    return new_map, n_new - appended
