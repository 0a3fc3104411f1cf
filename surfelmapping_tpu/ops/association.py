"""Projective data association + merge computation (the heart of fusion).

Re-expresses src/Shaders/data.vert (the association+merge kernel) as dense
per-pixel array math.  For every valid pixel the kernel:

  1. builds a candidate surfel (ops/frame_surfels.py);
  2. looks up the index map in a ``scale x scale`` sub-pixel window
     (scale = IndexMap::FACTOR = 1 in the reference, src/IndexMap.cpp:21, so
     the window is the single co-located pixel);
  3. gates candidates by same semantic class, ray-depth distance <=
     fuseThresh and normal angle < 0.5 rad, picking the minimum
     perpendicular-ray distance (data.vert:126-172);
  4. emits the merged surfel (confidence-weighted average, data.vert:174-208),
     a new unstable surfel (mark -1, data.vert:210-225) or invalid (mark -10).

Mark semantics (the reference's vColor.y, see SURVEY appendix):
  -10 invalid pixel | -1 new unstable surfel | >=0 id of model surfel to fuse.

Faithfully reproduced quirks:
  * index-map validity is ``id > 0`` — surfel 0 is unmatchable (data.vert:142);
  * the merged color averages the *new* color with itself (data.vert:183), so
    the merged color is exactly the new color;
  * the merged radius is min(new, old) after the weighted average is
    overwritten (data.vert:193).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics, PipelineParams
from ..surfels import SurfelMap
from .frame_surfels import FrameSurfels, association_candidates, ray_geometry
from .index_map import gather_fields
from .transforms import rotate_vectors, safe_normalize, transform_points


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AssociationResult:
    """Dense per-pixel fusion records in the WORLD frame ([H,W] leaves).

    mark: i32[H,W] with the reference's -10 / -1 / >=0 convention.
    """

    pos: jax.Array      # f32[H,W,3] world position (merged or new)
    conf: jax.Array     # f32[H,W]
    rgb: jax.Array      # f32[H,W,3]
    sem: jax.Array      # i32[H,W]
    init_t: jax.Array   # f32[H,W]
    last_t: jax.Array   # f32[H,W]
    normal: jax.Array   # f32[H,W,3]
    radius: jax.Array   # f32[H,W]
    mark: jax.Array     # i32[H,W]


def _angle_between(a: jax.Array, b: jax.Array) -> jax.Array:
    """acos(a.b / (|a||b|)) exactly as data.vert:54-57."""
    denom = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
    cosv = jnp.sum(a * b, axis=-1) / jnp.maximum(denom, 1e-12)
    return jnp.arccos(jnp.clip(cosv, -1.0, 1.0))


def associate(
    depth: jax.Array,
    rgb: jax.Array,
    semantic: jax.Array,
    index_image: jax.Array,
    smap: SurfelMap,
    pose: jax.Array,
    T_inv: jax.Array,
    time: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
    fuse_thresh: float | None = None,
) -> AssociationResult:
    """Run the association+merge kernel over the whole frame.

    ``index_image`` is the i32[H*F, W*F] output of build_index_map for the
    same pose.  ``fuse_thresh`` defaults to params.fuse_thresh_factor
    (Config::surfelFuseDistanceThreshFactor, 0.0 in the reference build).
    """
    p = params
    if fuse_thresh is None:
        fuse_thresh = p.fuse_thresh_factor
    factor = p.index_factor
    H, W = cam.height, cam.width

    cand = association_candidates(depth, rgb, semantic, cam, p)
    ray, lam = ray_geometry(cam)

    # ---- window search over the index map --------------------------------
    # The GLSL window is windowSize = scale subpixels centred on the pixel
    # (data.vert:126-172).  For scale==1 that is exactly the co-located
    # index-map texel; for scale>1 we scan the scale^2 sub-pixel lattice.
    best = None
    for wi in range(factor):
        for wj in range(factor):
            # sub-pixel texel of the FACTOR-scaled index image under pixel
            # (j, i): texcoord +- offsets land on texel (j*F + wj, i*F + wi)
            # after the centred window (windowSize-1)/2 shift.
            sub = index_image[wj::factor, wi::factor]  # [H, W] texels
            mid = sub
            has = mid > 0  # reference validity convention
            g = gather_fields(smap, mid, T_inv)
            pos_o = g["pos"]
            sem_o = g["sem"]
            # gates: same class && ray-depth distance <= fuseThresh
            depth_gate = (
                jnp.abs(pos_o[..., 2] * lam - depth * lam)
                <= fuse_thresh
            )
            sem_gate = cand.sem == sem_o
            # perpendicular distance of the old vertex to the pixel ray
            cr = jnp.cross(
                jnp.broadcast_to(ray, pos_o.shape), pos_o
            )
            dist = jnp.linalg.norm(cr, axis=-1) / lam
            ang = _angle_between(g["normal"], cand.normal)
            ok = has & sem_gate & depth_gate & (jnp.abs(ang) < p.merge_normal_angle)
            dist = jnp.where(ok, dist, jnp.inf)
            entry = {
                "dist": dist,
                "id": mid,
                "pos_o": pos_o,
                "conf_o": g["conf"],
                "rgb_o": g["rgb"],
                "init_o": g["init_t"],
                "normal_o": g["normal"],
                "radius_o": g["radius"],
            }
            if best is None:
                best = entry
            else:
                take = entry["dist"] < best["dist"]
                best = {
                    k: jnp.where(
                        take[..., None] if best[k].ndim == 3 else take,
                        entry[k],
                        best[k],
                    )
                    for k in best
                }

    matched = cand.valid & jnp.isfinite(best["dist"])

    # ---- merge math (data.vert:174-208) ----------------------------------
    c_n = cand.conf
    c_o = best["conf_o"]
    csum = c_n + c_o
    merge_small = cand.radius < p.merge_radius_factor * best["radius_o"]

    # small-radius branch: confidence-weighted average in camera frame
    pos_avg = (c_n[..., None] * cand.pos + c_o[..., None] * best["pos_o"]) / csum[
        ..., None
    ]
    nr_new = jnp.concatenate([cand.normal, cand.radius[..., None]], axis=-1)
    nr_old = jnp.concatenate(
        [best["normal_o"], best["radius_o"][..., None]], axis=-1
    )
    nr_avg = (c_n[..., None] * nr_new + c_o[..., None] * nr_old) / csum[..., None]

    pos_m = jnp.where(merge_small[..., None], pos_avg, best["pos_o"])
    normal_m = jnp.where(merge_small[..., None], nr_avg[..., :3], best["normal_o"])
    radius_m = jnp.where(
        merge_small,
        jnp.minimum(cand.radius, best["radius_o"]),
        best["radius_o"],
    )
    # data.vert:183 computes ((c_n*color_n)+(c_o*color_n))/(c_n+c_o) == color_n
    rgb_m = jnp.where(merge_small[..., None], cand.rgb, best["rgb_o"])

    # select merged vs new-unstable records (camera frame)
    pos_c = jnp.where(matched[..., None], pos_m, cand.pos)
    normal_c = jnp.where(matched[..., None], normal_m, cand.normal)
    conf = jnp.where(matched, csum, c_n)
    radius = jnp.where(matched, radius_m, cand.radius)
    rgb_out = jnp.where(matched[..., None], rgb_m, cand.rgb)
    init_t = jnp.where(matched, best["init_o"], time)
    last_t = jnp.full_like(init_t, time)

    # world frame
    pos_w = transform_points(pose, pos_c)
    normal_w = safe_normalize(rotate_vectors(pose, normal_c))

    # 8-bit color lattice: encodeColor rounds channels to u8 on every write
    # (color.glsl:19-26); keep the same quantisation for checkpoint parity.
    rgb_q = jnp.round(jnp.clip(rgb_out, 0.0, 1.0) * 255.0) / 255.0

    mark = jnp.where(
        cand.valid,
        jnp.where(matched, best["id"], -1),
        -10,
    ).astype(jnp.int32)

    return AssociationResult(
        pos=pos_w,
        conf=conf,
        rgb=rgb_q,
        sem=cand.sem,
        init_t=init_t,
        last_t=last_t,
        normal=normal_w,
        radius=radius,
        mark=mark,
    )
