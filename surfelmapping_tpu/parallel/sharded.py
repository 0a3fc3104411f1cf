"""Slot-sharded surfel fusion over a JAX device mesh.

The reference has no distributed execution at all (single process, single GL
context; SURVEY.md section 2d).  This module is the scaling design the TPU
build adds: the surfel buffer is sharded across a 1-D ``shard`` mesh axis
(each device owns capacity/D contiguous slots with its own live count), and
one fusion step runs under ``shard_map`` with exactly three collectives:

  1. ``pmin`` over per-device index-map depth keys — the cross-chip z-buffer;
  2. ``pmin`` over winner-id candidates — deterministic tie-break (min global
     id) for the cross-chip winner resolution;
  3. ``psum`` of per-pixel gathered attributes — each device contributes the
     attribute images for the pixels whose winning surfel it owns.

All other stages (conflict test, compaction, merge math, fuse scatter,
append) are purely local to each shard.  New surfels are dealt round-robin by
global rank so shards stay balanced; surfel ids are frame-ephemeral (consumed
by the fuse scatter in the same step), so per-device re-compaction never
breaks mark invariants.

Frame preprocessing is replicated (it is <1% of the per-frame FLOPs); the
association math is likewise computed identically on every device from the
psum-combined images — redundant VPU work traded for zero extra collectives.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import CameraIntrinsics, PipelineParams
from ..ops.association import AssociationResult, associate
from ..ops.fusion import _column_major_flat
from ..ops.index_map import INT32_MAX, _depth_key
from ..ops.preprocess import preprocess_frame, remove_movings
from ..ops.transforms import compose, invert_se3, rotate_vectors, safe_normalize, transform_points
from ..surfels import SurfelMap

AXIS = "shard"


# ---------------------------------------------------------------------------
# Sharded state
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardedMapState:
    """SurfelMap with a per-device live count.  Array leaves are sharded on
    axis 0 with PartitionSpec('shard'); counts is i32[D] (one per device)."""

    pos: jax.Array
    conf: jax.Array
    rgb: jax.Array
    sem: jax.Array
    init_t: jax.Array
    last_t: jax.Array
    normal: jax.Array
    radius: jax.Array
    counts: jax.Array  # i32[D]


def empty_sharded(capacity: int, n_devices: int) -> ShardedMapState:
    if capacity % n_devices:
        raise ValueError("capacity must divide evenly across devices")
    z = jnp.zeros
    return ShardedMapState(
        pos=z((capacity, 3), jnp.float32),
        conf=z((capacity,), jnp.float32),
        rgb=z((capacity, 3), jnp.float32),
        sem=z((capacity,), jnp.int32),
        init_t=z((capacity,), jnp.float32),
        last_t=z((capacity,), jnp.float32),
        normal=z((capacity, 3), jnp.float32),
        radius=z((capacity,), jnp.float32),
        counts=z((n_devices,), jnp.int32),
    )


def state_sharding(mesh: Mesh) -> ShardedMapState:
    """PartitionSpec pytree for ShardedMapState."""
    vec = NamedSharding(mesh, P(AXIS))
    return ShardedMapState(
        pos=vec, conf=vec, rgb=vec, sem=vec, init_t=vec, last_t=vec,
        normal=vec, radius=vec, counts=vec,
    )


# ---------------------------------------------------------------------------
# The sharded step (runs inside shard_map; all shapes are per-device)
# ---------------------------------------------------------------------------

def _local_compact(arrs: dict[str, jax.Array], count: jax.Array, S: int):
    keep = (jnp.arange(S, dtype=jnp.int32) < count) & (arrs["conf"] > 0.0)
    dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
    new_count = jnp.maximum(dest[-1] + 1, 0).astype(jnp.int32)
    idx = jnp.where(keep, dest, S)
    out = {
        k: jnp.zeros_like(v).at[idx].set(v, mode="drop") for k, v in arrs.items()
    }
    return out, new_count


def _shard_step_body(
    state: ShardedMapState,
    depth_m: jax.Array,
    rgb: jax.Array,
    semantic: jax.Array,
    pose: jax.Array,
    time: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
    n_devices: int,
):
    p = params
    H, W = cam.height, cam.width
    num_pix = H * W
    S = state.pos.shape[0]  # local slots (shard_map gives per-device view)
    me = jax.lax.axis_index(AXIS)
    count = state.counts[0]
    T_inv = invert_se3(pose)

    arrs = {
        "pos": state.pos, "conf": state.conf, "rgb": state.rgb,
        "sem": state.sem, "init_t": state.init_t, "last_t": state.last_t,
        "normal": state.normal, "radius": state.radius,
    }
    slots = jnp.arange(S, dtype=jnp.int32)
    gid0 = me.astype(jnp.int32) * S

    # ---- 1. conflict (local) -------------------------------------------
    pc = transform_points(T_inv, arrs["pos"])
    z = pc[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    xl, yl = pc[:, 0] / safe_z, pc[:, 1] / safe_z
    u, v = cam.fx * xl + cam.cx, cam.fy * yl + cam.cy
    in_view = (
        (u >= p.stereo_border) & (u <= W) & (v >= 0) & (v <= H)
        & (z > p.near_clip) & (z < p.far_clip)
    )
    lam = jnp.sqrt(xl * xl + yl * yl + 1.0)
    ui = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 1)
    d = depth_m[vi, ui]
    sem_px = semantic[vi, ui]
    d = jnp.where(sem_px == p.sky_class, p.far_clip + 1.0, d)
    d = jnp.where(d == 0.0, p.far_clip + 20.0, d)
    violates = (d * lam - z * lam) > (p.fuse_thresh_factor * z)
    live = slots < count
    hit = live & ((gid0 + slots) > 0) & in_view & violates
    arrs["conf"] = jnp.where(hit, arrs["conf"] - p.conflict_conf_decrement, arrs["conf"])
    count_before = count

    # ---- 2. local compaction -------------------------------------------
    arrs, count = _local_compact(arrs, count, S)
    removed_local = count_before - count

    # ---- 3. distributed index map --------------------------------------
    pc = transform_points(T_inv, arrs["pos"])
    z = pc[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    uu = cam.fx * pc[:, 0] / safe_z + cam.cx
    vv = cam.fy * pc[:, 1] / safe_z + cam.cy
    pi = jnp.ceil(uu).astype(jnp.int32) - 1
    pj = jnp.ceil(vv).astype(jnp.int32) - 1
    inb = (pi >= 0) & (pi < W) & (pj >= 0) & (pj < H)
    live = slots < count
    fresh = (time - arrs["last_t"]) <= p.time_delta
    active = live & fresh & (z > 0.0) & (z < p.far_clip) & inb
    key = _depth_key(z, active)
    flat = jnp.where(active, pj * W + pi, num_pix)
    key_local = jnp.full((num_pix,), INT32_MAX, jnp.int32).at[flat].min(
        key, mode="drop"
    )
    key_global = jax.lax.pmin(key_local, AXIS)
    # winner gid: min global id among local minimizers
    win = active & (key == key_global[jnp.clip(flat, 0, num_pix - 1)])
    gids = gid0 + slots
    gid_local = jnp.full((num_pix,), INT32_MAX, jnp.int32).at[
        jnp.where(win, flat, num_pix)
    ].min(gids, mode="drop")
    gid_global = jax.lax.pmin(gid_local, AXIS)
    id_img = jnp.where(gid_global == INT32_MAX, -1, gid_global).reshape(H, W)

    # ---- 4. attribute images via owner-gather + psum -------------------
    idf = id_img.reshape(-1)
    owner = idf // S
    lidx = jnp.clip(jnp.where(owner == me, idf - gid0, 0), 0, S - 1)
    mine = (owner == me) & (idf >= 0)

    def contrib(a):
        g = a[lidx]
        m = mine.reshape((-1,) + (1,) * (g.ndim - 1))
        return jnp.where(m, g, 0)

    # camera-frame position & normal of the winning surfel
    pos_cam_img = jax.lax.psum(contrib(transform_points(T_inv, arrs["pos"])), AXIS)
    nrm_cam_img = jax.lax.psum(
        contrib(safe_normalize(rotate_vectors(T_inv, arrs["normal"]))), AXIS
    )
    conf_img = jax.lax.psum(contrib(arrs["conf"]), AXIS)
    rgb_img_o = jax.lax.psum(contrib(arrs["rgb"]), AXIS)
    sem_img_o = jax.lax.psum(contrib(arrs["sem"]), AXIS)
    init_img = jax.lax.psum(contrib(arrs["init_t"]), AXIS)
    rad_img = jax.lax.psum(contrib(arrs["radius"]), AXIS)

    # ---- 5. association (replicated compute) ---------------------------
    # Reuse the single-chip associate() by feeding it a pixel-indexed
    # pseudo-map built from the psum-combined attribute images.  Row 0 of the
    # pseudo arrays is a sentinel so pixel k maps to pseudo id k+1, keeping
    # the reference's ``id > 0`` validity convention intact for every pixel.
    def with_sentinel(img):
        flatimg = img.reshape((num_pix,) + img.shape[1:])
        return jnp.concatenate(
            [jnp.zeros((1,) + flatimg.shape[1:], flatimg.dtype), flatimg], axis=0
        )

    pseudo = SurfelMap(
        pos=with_sentinel(transform_points(pose, pos_cam_img)),
        conf=with_sentinel(conf_img),
        rgb=with_sentinel(rgb_img_o),
        sem=with_sentinel(sem_img_o),
        init_t=with_sentinel(init_img),
        last_t=with_sentinel(jnp.zeros_like(conf_img)),
        normal=with_sentinel(safe_normalize(rotate_vectors(pose, nrm_cam_img))),
        radius=with_sentinel(rad_img),
        count=jnp.int32(num_pix + 1),
    )
    pix1 = jnp.arange(1, num_pix + 1, dtype=jnp.int32).reshape(H, W)
    pixel_ids = jnp.where(id_img > 0, pix1, -1)
    assoc = associate(
        depth_m, rgb, semantic, pixel_ids, pseudo, pose, T_inv, time, cam, params
    )
    # rewrite marks from pixel space back to global surfel ids (FACTOR==1:
    # a pixel's match can only be its own co-located index-map texel)
    assert params.index_factor == 1, "sharded path supports index_factor=1"
    mark = jnp.where(assoc.mark >= 0, id_img, assoc.mark)
    assoc = dataclasses.replace(assoc, mark=mark)

    # ---- 6. fuse scatter (local subset) --------------------------------
    mflat = assoc.mark.reshape(-1)
    fuse_mine = (mflat >= 0) & (mflat // S == me)
    fidx = jnp.where(fuse_mine, mflat - gid0, S)

    def flat2(a):
        return a.reshape((-1,) + a.shape[2:])

    arrs["pos"] = arrs["pos"].at[fidx].set(flat2(assoc.pos), mode="drop")
    arrs["conf"] = arrs["conf"].at[fidx].set(flat2(assoc.conf), mode="drop")
    arrs["rgb"] = arrs["rgb"].at[fidx].set(flat2(assoc.rgb), mode="drop")
    arrs["sem"] = arrs["sem"].at[fidx].set(flat2(assoc.sem), mode="drop")
    arrs["init_t"] = arrs["init_t"].at[fidx].set(flat2(assoc.init_t), mode="drop")
    arrs["last_t"] = arrs["last_t"].at[fidx].set(flat2(assoc.last_t), mode="drop")
    arrs["normal"] = arrs["normal"].at[fidx].set(flat2(assoc.normal), mode="drop")
    arrs["radius"] = arrs["radius"].at[fidx].set(flat2(assoc.radius), mode="drop")

    # ---- 7. round-robin append -----------------------------------------
    is_new = _column_major_flat(assoc.mark) == -1
    rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    n_new = jnp.maximum(rank[-1] + 1, 0)
    to_me = is_new & (rank % n_devices == me)
    dest = count + jnp.where(to_me, rank // n_devices, S)
    ok = to_me & (dest < S)
    aidx = jnp.where(ok, dest, S)

    def app(key):
        src = _column_major_flat(getattr(assoc, key))
        return arrs[key].at[aidx].set(src, mode="drop")

    n_new_me = jnp.sum(to_me.astype(jnp.int32))
    appended = jnp.minimum(n_new_me, jnp.maximum(S - count, 0))
    dropped = jax.lax.psum(n_new_me - appended, AXIS)
    for k in arrs:
        arrs[k] = app(k)
    count = count + appended

    new_state = ShardedMapState(counts=count[None], **arrs)
    stats = {
        "count": jax.lax.psum(count, AXIS),
        "removed": jax.lax.psum(removed_local, AXIS),
        "new": n_new,
        "merged": jnp.sum(assoc.mark >= 0),
        "dropped": dropped,
    }
    return new_state, stats


def make_sharded_step(
    mesh: Mesh, cam: CameraIntrinsics, params: PipelineParams, n_devices: int
):
    """Build the jitted sharded fusion step.

    Signature: (state, depth_raw u16[H,W], rgb f32[H,W,3], semantic i32[H,W],
    pose, last_depth, last_pose, time) -> (state, last_depth', stats).
    """
    try:
        from jax import shard_map  # jax >= 0.6 public API
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    sh = state_sharding(mesh)
    spec_state = jax.tree.map(lambda s: s.spec, sh)
    rep = P()

    body = functools.partial(
        _shard_step_body, cam=cam, params=params, n_devices=n_devices
    )
    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec_state, rep, rep, rep, rep, rep),
        out_specs=(spec_state, rep),
        check_vma=False,
    )

    @jax.jit
    def step(state, depth_raw, rgb, semantic, pose, last_depth, last_pose, time):
        depth_f = preprocess_frame(depth_raw, semantic, cam, params)
        T_c2l = compose(invert_se3(last_pose), pose)
        depth_m = remove_movings(depth_f, semantic, last_depth, T_c2l, cam, params)
        new_state, stats = sharded(state, depth_m, rgb, semantic, pose, time)
        return new_state, depth_f, stats

    return step


# ---------------------------------------------------------------------------
# Dry run used by __graft_entry__.dryrun_multichip
# ---------------------------------------------------------------------------

def dryrun(n_devices: int) -> None:
    """Create an n_devices mesh, jit the full sharded fusion step, and run
    two frames of a tiny synthetic scene."""
    from ..io.synthetic import SyntheticScene, tiny_cam

    devices = np.array(jax.devices()[:n_devices])
    mesh = Mesh(devices, (AXIS,))
    cam = tiny_cam(128, 64)
    params = PipelineParams()
    cap = 1 << 14
    state = jax.device_put(
        empty_sharded(cap, n_devices), state_sharding(mesh)
    )
    step = make_sharded_step(mesh, cam, params, n_devices)

    scene = SyntheticScene(cam)
    last_depth = jnp.zeros((cam.height, cam.width), jnp.float32)
    last_pose = jnp.asarray(scene.pose(0))
    for i in range(1, 3):
        rgb, depth, sem, pose = scene.frame(i)
        state, last_depth, stats = step(
            state,
            jnp.asarray(depth),
            jnp.asarray(rgb, jnp.float32) / 255.0,
            jnp.asarray(sem.astype(np.int32)),
            jnp.asarray(pose),
            last_depth,
            last_pose,
            jnp.float32(i),
        )
        last_pose = jnp.asarray(pose)
    total = int(stats["count"])
    assert total > 0, "sharded step produced an empty map"
