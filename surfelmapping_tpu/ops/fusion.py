"""Map-update passes: free-space conflict, confidence decrement, compaction,
fuse scatter, and append of new surfels.

TPU-native re-expressions of the reference's transform-feedback / FBO-scatter
stages (all operating directly on the SoA surfel arrays — the model-map
texture mirror of src/GlobalModel.cpp:639-681 does not exist here):

  * conflict_pass / apply:  conflict.vert/.geom + update_conf.vert/.frag
                            (src/GlobalModel.cpp:396-515)
  * compact:                back_map.vert/.geom (src/GlobalModel.cpp:517-579)
                            — stream compaction via prefix-sum scatter
  * fuse_scatter:           fuse.vert/.frag (src/GlobalModel.cpp:348-394)
  * append_new:             unstable.vert/.geom + glCopyBufferSubData
                            (src/GlobalModel.cpp:581-637)
  * initialize_map:         init_unstable.vert (src/GlobalModel.cpp:191-244)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics, PipelineParams
from ..surfels import SurfelMap
from .association import AssociationResult
from .frame_surfels import FrameSurfels
from .transforms import rotate_vectors, safe_normalize, transform_points


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
    """Free-space violation test per surfel (conflict.vert).

    Returns the updated confidence array (conf - 1 where the surfel floats in
    front of the current measurement).  Gates and special depths follow
    conflict.vert:35-73; the conflict.geom:17 ``id > 0`` filter exempts
    surfel 0, reproduced here.
    """
    p = params
    H, W = cam.height, cam.width
    pc = transform_points(T_inv, smap.pos)
    z = pc[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    xl = pc[:, 0] / safe_z
    yl = pc[:, 1] / safe_z
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

    # nearest-texel sample at texcoord (u/cols, v/rows), clamped to edge
    ui = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 1)
    d = depth[vi, ui]
    sem = semantic[vi, ui]

    d = jnp.where(sem == p.sky_class, max_depth + 1.0, d)
    if not is_clean:
        d = jnp.where(d == 0.0, max_depth + 20.0, d)

    violates = (d * lam - z * lam) > (fuse_thresh * z)

    ids = jnp.arange(smap.capacity, dtype=jnp.int32)
    hit = smap.live_mask() & (ids > 0) & in_view & violates
    return jnp.where(hit, smap.conf - p.conflict_conf_decrement, smap.conf)


def compact(smap: SurfelMap) -> SurfelMap:
    """Back-mapping compaction: drop rows with conf <= 0, preserve order
    (back_map.geom keeps conf > 0, src/GlobalModel.cpp:517-579).  The
    persisted mark column resets to 0 there; marks are not stored in the SoA
    map so nothing to reset."""
    keep = smap.live_mask() & (smap.conf > 0.0)
    dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
    new_count = jnp.maximum(dest[-1] + 1, 0).astype(jnp.int32)
    idx = jnp.where(keep, dest, smap.capacity)  # dropped -> out of range

    def scat(dst, src):
        return jnp.zeros_like(dst).at[idx].set(src, mode="drop")

    return SurfelMap(
        pos=scat(smap.pos, smap.pos),
        conf=scat(smap.conf, smap.conf),
        rgb=scat(smap.rgb, smap.rgb),
        sem=scat(smap.sem, smap.sem),
        init_t=scat(smap.init_t, smap.init_t),
        last_t=scat(smap.last_t, smap.last_t),
        normal=scat(smap.normal, smap.normal),
        radius=scat(smap.radius, smap.radius),
        count=new_count,
    )


def fuse_scatter(smap: SurfelMap, assoc: AssociationResult) -> SurfelMap:
    """Write merged records over their target surfels (fuse.vert scatters
    rows with mark >= 0 at texel(mark); here a direct indexed scatter).

    Duplicate marks (two pixels merging into the same surfel) resolve to an
    arbitrary winner, matching the GL point-scatter's draw-order race — every
    candidate was computed against the same snapshot so all are consistent.
    """
    mark = assoc.mark.reshape(-1)
    write = mark >= 0
    idx = jnp.where(write, mark, smap.capacity)

    def flat(a):
        return a.reshape((-1,) + a.shape[2:])

    return dataclasses.replace(
        smap,
        pos=smap.pos.at[idx].set(flat(assoc.pos), mode="drop"),
        conf=smap.conf.at[idx].set(flat(assoc.conf), mode="drop"),
        rgb=smap.rgb.at[idx].set(flat(assoc.rgb), mode="drop"),
        sem=smap.sem.at[idx].set(flat(assoc.sem), mode="drop"),
        init_t=smap.init_t.at[idx].set(flat(assoc.init_t), mode="drop"),
        last_t=smap.last_t.at[idx].set(flat(assoc.last_t), mode="drop"),
        normal=smap.normal.at[idx].set(flat(assoc.normal), mode="drop"),
        radius=smap.radius.at[idx].set(flat(assoc.radius), mode="drop"),
    )


def _column_major_flat(a: jax.Array) -> jax.Array:
    """Flatten [H,W,...] in column-major pixel order (col*H + row) — the
    reference's uv-lattice order (src/GlobalModel.cpp:66-73), so appended
    surfels receive identical ids."""
    return jnp.swapaxes(a, 0, 1).reshape((-1,) + a.shape[2:])


def append_new(smap: SurfelMap, assoc: AssociationResult) -> tuple[SurfelMap, jax.Array]:
    """Append rows with mark == -1 (new unstable surfels) to the live prefix
    (unstable.vert/.geom + concatenate, src/GlobalModel.cpp:581-637).

    Returns (map, n_dropped) where n_dropped > 0 signals capacity overflow —
    the host grows the buffer and replays the frame (the reference would
    silently corrupt past 25M surfels; we refuse to lose surfels).
    """
    mark = _column_major_flat(assoc.mark)
    is_new = mark == -1
    offs = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    n_new = jnp.maximum(offs[-1] + 1, 0)
    dest = smap.count + offs
    ok = is_new & (dest < smap.capacity)
    idx = jnp.where(ok, dest, smap.capacity)

    def app(dst, src):
        return dst.at[idx].set(_column_major_flat(src), mode="drop")

    appended = jnp.minimum(n_new, jnp.maximum(smap.capacity - smap.count, 0))
    new_map = dataclasses.replace(
        smap,
        pos=app(smap.pos, assoc.pos),
        conf=app(smap.conf, assoc.conf),
        rgb=app(smap.rgb, assoc.rgb),
        sem=app(smap.sem, assoc.sem),
        init_t=app(smap.init_t, assoc.init_t),
        last_t=app(smap.last_t, assoc.last_t),
        normal=app(smap.normal, assoc.normal),
        radius=app(smap.radius, assoc.radius),
        count=smap.count + appended,
    )
    return new_map, n_new - appended


def initialize_map(
    smap: SurfelMap, frame: FrameSurfels, pose: jax.Array, time: jax.Array | float = 0.0
) -> tuple[SurfelMap, jax.Array]:
    """First-map initialization from a feedback-buffer frame: world-transform
    every valid camera-frame surfel and write it into the (empty) map
    (init_unstable.vert + GlobalModel::initialize).

    Returns (map, n_dropped).  Uses the same column-major pixel order as the
    reference's feedback lattice (src/FeedbackBuffer.cpp:43-59).
    """
    pos_w = transform_points(pose, frame.pos)
    normal_w = safe_normalize(rotate_vectors(pose, frame.normal))
    rgb_q = jnp.round(jnp.clip(frame.rgb, 0.0, 1.0) * 255.0) / 255.0

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
        pos=app(smap.pos, pos_w),
        conf=app(smap.conf, frame.conf),
        rgb=app(smap.rgb, rgb_q),
        sem=app(smap.sem, frame.sem),
        init_t=app(smap.init_t, time_img),
        last_t=app(smap.last_t, time_img),
        normal=app(smap.normal, normal_w),
        radius=app(smap.radius, frame.radius),
        count=smap.count + appended,
    )
    return new_map, n_new - appended
