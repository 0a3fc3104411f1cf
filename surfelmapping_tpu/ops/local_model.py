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
from .transforms import normalize_planar, rotate_planar, transform_planar


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
    wx, wy, wz = transform_planar(pose, fs.px, fs.py, fs.pz)
    wnx, wny, wnz = normalize_planar(*rotate_planar(pose, fs.nx, fs.ny, fs.nz))

    valid = _column_major_flat(fs.valid)
    n = valid.shape[0]
    dest = jnp.cumsum(valid.astype(jnp.int32)) - 1
    count = jnp.maximum(dest[-1] + 1, 0)
    idx = jnp.where(valid, dest, n)

    def cp(a):
        src = _column_major_flat(a)
        return jnp.zeros((n,), src.dtype).at[idx].set(src, mode="drop")

    t = jnp.full(fs.conf.shape, time, jnp.float32)
    return SurfelMap(
        px=cp(wx), py=cp(wy), pz=cp(wz),
        conf=cp(fs.conf),
        colorsem=cp(fs.colorsem),
        init_t=cp(t),
        last_t=cp(t),
        nx=cp(wnx), ny=cp(wny), nz=cp(wnz),
        radius=cp(fs.radius),
        count=count.astype(jnp.int32),
    )
