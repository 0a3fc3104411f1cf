"""Local surfel model: unconditional per-pixel surfel creation.

Counterpart of GlobalModel::getLocalSurfelModel + genLSM.vert/.geom
(src/GlobalModel.cpp:1077-1176): the same candidate-surfel front half as the
association kernel but without association — every valid pixel becomes a new
unstable world-frame surfel (mark -1).  The reference computes this every
frame into a scratch VBO (used for inspection/visualization); here it is an
on-demand pure function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics, PipelineParams
from ..surfels import SurfelMap
from .frame_surfels import association_candidates
from .fusion import _column_major_flat
from .transforms import rotate_vectors, safe_normalize, transform_points


def local_surfel_model(
    depth: jax.Array,
    rgb: jax.Array,
    semantic: jax.Array,
    pose: jax.Array,
    time: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
) -> SurfelMap:
    """Returns a compacted SurfelMap of this frame's surfels in world frame
    (capacity = H*W, live prefix = number of valid pixels, reference uv
    column-major order)."""
    fs = association_candidates(depth, rgb, semantic, cam, params)
    pos_w = transform_points(pose, fs.pos)
    normal_w = safe_normalize(rotate_vectors(pose, fs.normal))
    rgb_q = jnp.round(jnp.clip(fs.rgb, 0.0, 1.0) * 255.0) / 255.0

    valid = _column_major_flat(fs.valid)
    n = valid.shape[0]
    dest = jnp.cumsum(valid.astype(jnp.int32)) - 1
    count = jnp.maximum(dest[-1] + 1, 0)
    idx = jnp.where(valid, dest, n)

    def cp(a, extra_shape=()):
        src = _column_major_flat(a)
        out = jnp.zeros((n,) + extra_shape, src.dtype)
        return out.at[idx].set(src, mode="drop")

    t = jnp.full(fs.conf.shape, time, jnp.float32)
    return SurfelMap(
        pos=cp(pos_w, (3,)),
        conf=cp(fs.conf),
        rgb=cp(rgb_q, (3,)),
        sem=cp(fs.sem),
        init_t=cp(t),
        last_t=cp(t),
        normal=cp(normal_w, (3,)),
        radius=cp(fs.radius),
        count=count.astype(jnp.int32),
    )
