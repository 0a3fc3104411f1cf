"""Block-sharded surfel fusion over a JAX device mesh.

The reference has no distributed execution at all (single process, single GL
context; SURVEY.md section 2d).  This module is the scaling design the TPU
build adds: the planar surfel buffer is sharded across a 1-D ``shard`` mesh
axis (each device owns capacity/D contiguous slots with its own live count),
every device runs the SAME active-block machinery as the single-chip engine
(ops/active.py — plan/gather/conflict/index/associate/fuse are imported, not
re-implemented) over its own slots, and the cross-device coupling is exactly
THREE image-sized collectives per frame:

  1. ``pmin`` of the per-device z-buffer depth keys  (i32[H*W])   — the
     cross-chip depth test;
  2. ``pmin`` of per-device winner GLOBAL ids         (i32[H*W])  — winner
     resolution with the same min-id tie-break as the single-chip engine;
  3. ``pmax`` of the per-device "pixel matched" mask  (i32[Hc*Wc]) — so every
     device knows which valid pixels became new surfels.

Association gathers and the fuse scatter address only the LOCAL slot range
of the winning device (no attribute images are exchanged — round 1's design
psum'd 7 attribute images per frame, which capped scaling).  New surfels are
dealt round-robin by lattice rank so shards stay balanced; removal is
tombstoned per shard exactly like the single-chip engine.

Multi-host: the same ``make_sharded_step`` works over a mesh spanning hosts
(``jax.distributed.initialize`` + a global mesh); the three collectives ride
ICI within a host and DCN across hosts.  See parallel/distributed.py for the
multi-host entry helper and the scaling benchmark.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import CameraIntrinsics, PipelineParams
from ..ops.active import (
    INT32_MAX,
    append_round_robin,
    associate_active,
    conflict_active,
    fuse_active,
    gather_active,
    index_candidates,
    index_resolve,
    map_from_table,
    plan_active_blocks,
    table_from_map,
    writeback_active,
)
from ..ops.preprocess import preprocess_frame, remove_movings
from ..ops.transforms import compose, invert_se3
from ..surfels import SurfelMap

AXIS = "shard"


# ---------------------------------------------------------------------------
# Sharded state (planar, like surfels.SurfelMap, with per-device counts)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardedMapState:
    """Planar SurfelMap columns sharded on axis 0 with PartitionSpec('shard');
    counts is i32[D] (one live-prefix cursor per device)."""

    px: jax.Array
    py: jax.Array
    pz: jax.Array
    conf: jax.Array
    colorsem: jax.Array
    init_t: jax.Array
    last_t: jax.Array
    nx: jax.Array
    ny: jax.Array
    nz: jax.Array
    radius: jax.Array
    counts: jax.Array  # i32[D]


_COLS = ("px", "py", "pz", "conf", "colorsem", "init_t", "last_t",
         "nx", "ny", "nz", "radius")


def empty_sharded(capacity: int, n_devices: int) -> ShardedMapState:
    if capacity % n_devices:
        raise ValueError("capacity must divide evenly across devices")
    z = jnp.zeros((capacity,), jnp.float32)
    return ShardedMapState(
        **{k: z for k in _COLS},
        counts=jnp.zeros((n_devices,), jnp.int32),
    )


def state_sharding(mesh: Mesh) -> ShardedMapState:
    """NamedSharding pytree for ShardedMapState."""
    vec = NamedSharding(mesh, P(AXIS))
    return ShardedMapState(**{k: vec for k in _COLS}, counts=vec)


def gather_sharded_map(state: ShardedMapState, n_devices: int) -> SurfelMap:
    """Host-side: concatenate the live prefixes of all shards into one
    compacted single-chip SurfelMap (for rendering / checkpointing)."""
    S = state.px.shape[0] // n_devices
    counts = np.asarray(state.counts)
    cols = {k: np.asarray(getattr(state, k)) for k in _COLS}
    parts = {k: [] for k in _COLS}
    for d in range(n_devices):
        lo, c = d * S, counts[d]
        keep = cols["conf"][lo : lo + c] > 0.0
        for k in _COLS:
            parts[k].append(cols[k][lo : lo + c][keep])
    total = sum(p.shape[0] for p in parts["px"])
    return SurfelMap(
        **{k: jnp.asarray(np.concatenate(parts[k])) for k in _COLS},
        count=jnp.int32(total),
    )


# ---------------------------------------------------------------------------
# The sharded step (runs inside shard_map; all shapes are per-device)
# ---------------------------------------------------------------------------

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
    active_blocks: int,
    block_size: int,
):
    p = params
    fa = p.index_factor
    H, W = cam.height * fa, cam.width * fa
    num_pix = H * W
    S = state.px.shape[0]  # local slots (shard_map gives the per-device view)
    me = jax.lax.axis_index(AXIS).astype(jnp.int32)
    gid0 = me * S
    T_inv = invert_se3(pose)

    local = SurfelMap(
        **{k: getattr(state, k) for k in _COLS}, count=state.counts[0]
    )
    live_before = jnp.sum(local.conf > 0.0)

    # ---- 1. local active-block plan + gather (same ops as single chip) ---
    blk, n_active = plan_active_blocks(
        local, T_inv, cam, p, active_blocks, block_size
    )
    at = gather_active(local, blk, block_size)

    # ---- 2. conflict (purely local; global id>0 exemption via offset) ----
    at, removed_local = conflict_active(
        at, depth_m, semantic, T_inv, cam, p,
        min_depth=p.near_clip, max_depth=p.far_clip,
        fuse_thresh=p.fuse_thresh_factor, is_clean=False,
        gid_offset=gid0,
    )
    local = writeback_active(local, at, block_size)

    # ---- 3. distributed index map (collectives #1 and #2) ----------------
    zkey, fpix = index_candidates(at, T_inv, time, cam, p, gid_offset=gid0)
    zbuf_local = jnp.full((num_pix,), INT32_MAX, jnp.int32).at[fpix].min(
        zkey, mode="drop"
    )
    zbuf = jax.lax.pmin(zbuf_local, AXIS)
    global_ids = at.global_id + gid0
    id_raw = index_resolve(
        zkey, fpix, global_ids, num_pix, depth_buf=zbuf, empty_to_minus1=False
    )
    id_flat = jax.lax.pmin(id_raw, AXIS)
    id_flat = jnp.where(id_flat == INT32_MAX, -1, id_flat)

    # ---- 4. association against the LOCAL slot range ---------------------
    mine = (id_flat >= gid0) & (id_flat < gid0 + S)
    local_idx_img = jnp.where(mine, id_flat - gid0, -1).reshape(H, W)
    pseudo = table_from_map(local)
    assoc = associate_active(
        depth_m, rgb, semantic, local_idx_img, pseudo, pose, T_inv, time, cam, p
    )

    # ---- 5. global matched resolution (collective #3) --------------------
    matched_mine = assoc.mark >= 0
    matched_any = jax.lax.pmax(matched_mine.astype(jnp.int32), AXIS) > 0
    # pixels valid here but matched on ANOTHER device must not append
    mark = jnp.where(
        matched_mine,
        assoc.mark,
        jnp.where((assoc.mark == -1) & matched_any, -10, assoc.mark),
    )
    assoc = dataclasses.replace(assoc, mark=mark)

    # ---- 6. local fuse + round-robin append ------------------------------
    local = map_from_table(fuse_active(pseudo, assoc), local.count)
    local, dropped_local = append_round_robin(local, assoc, n_devices, me)

    live_after = jnp.sum(local.conf > 0.0)
    new_state = ShardedMapState(
        **{k: getattr(local, k) for k in _COLS}, counts=local.count[None]
    )
    stats = {
        "count": jax.lax.psum(live_after, AXIS),
        "removed": jax.lax.psum(removed_local, AXIS),
        "new": jnp.sum(mark == -1),  # replicated after matched resolution
        "merged": jax.lax.psum(jnp.sum(matched_mine), AXIS),
        "dropped": jax.lax.psum(dropped_local, AXIS),
        "active_blocks": jax.lax.pmax(n_active, AXIS),
    }
    return new_state, stats


def make_sharded_step(
    mesh: Mesh,
    cam: CameraIntrinsics,
    params: PipelineParams,
    n_devices: int,
    active_blocks: int = 64,
    block_size: int = 2048,
):
    """Build the jitted block-sharded fusion step.

    Signature: (state, depth_raw u16[H,W], rgb f32[H,W,3], semantic i32[H,W],
    pose, last_depth, last_pose, time) -> (state, last_depth', stats).

    ``active_blocks``/``block_size`` bound each device's LOCAL working set
    (same semantics as MapConfig; per-device capacity must divide by
    block_size).
    """
    try:
        from jax import shard_map  # jax >= 0.6 public API
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    sh = state_sharding(mesh)
    spec_state = jax.tree.map(lambda s: s.spec, sh)
    rep = P()

    body = functools.partial(
        _shard_step_body,
        cam=cam,
        params=params,
        n_devices=n_devices,
        active_blocks=active_blocks,
        block_size=block_size,
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
    block = (cap // n_devices) // 2 or 1
    state = jax.device_put(empty_sharded(cap, n_devices), state_sharding(mesh))
    step = make_sharded_step(
        mesh, cam, params, n_devices, active_blocks=4, block_size=block
    )

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
