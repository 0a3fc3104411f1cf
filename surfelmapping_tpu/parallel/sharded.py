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
    associate_active,
    conflict_active,
    fuse_append_shard,
    gather_active,
    index_candidates,
    plan_active_blocks,
)
from ..ops.pallas_zbuf import zbuffer_argmin_auto
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
    B = block_size
    G = S // B
    me = jax.lax.axis_index(AXIS).astype(jnp.int32)
    gid0 = me * S
    T_inv = invert_se3(pose)

    local = SurfelMap(
        **{k: getattr(state, k) for k in _COLS}, count=state.counts[0]
    )

    # ---- 1. local active-block plan + gather (same ops as single chip) ---
    # Frustum residency per shard: round-robin dealing keeps each shard's
    # append stream TEMPORALLY coherent (a block spans ~n_devices frames of
    # one trajectory arc), so a shard's in-frustum working set concentrates
    # in few blocks exactly like the single-chip engine — per-device work is
    # proportional to its 1/D share of the in-frustum surfels, not to its
    # capacity (tools/sharded_work.py measures this).
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

    # ---- 3. distributed index map (collectives #1 and #2) ----------------
    # Local z-buffer + winner id resolve in ONE Pallas pass on TPU
    # (ops/pallas_zbuf.py; XLA fallback elsewhere), then the cross-device
    # lexicographic (key, global id) min via two pmins.  at.global_id is
    # monotone in candidate index (blocks gathered ascending), so the
    # kernel's min-candidate-index tie-break equals the reference's
    # min-global-id tie-break after translation.
    zkey, fpix = index_candidates(at, T_inv, time, cam, p, gid_offset=gid0)
    n_valid = jnp.sum(at.slot_valid.astype(jnp.int32))
    zbuf_local, idx_local = zbuffer_argmin_auto(
        zkey, fpix, num_pix, n_valid=n_valid
    )
    zbuf = jax.lax.pmin(zbuf_local, AXIS)
    win = (zbuf_local == zbuf) & (zbuf_local != INT32_MAX)
    safe_idx = jnp.clip(idx_local, 0, at.size - 1)
    gid_win = jnp.where(win, at.global_id[safe_idx] + gid0, INT32_MAX)
    id_flat = jax.lax.pmin(gid_win, AXIS)
    id_flat = jnp.where(id_flat == INT32_MAX, -1, id_flat)

    # ---- 4. association against the gathered ACTIVE table ----------------
    # Winning global ids that live on this shard translate to active-table
    # slots through the inverse block map, so the per-pixel gathers stay at
    # active-table scale — NOT O(local capacity) (round-3 weakness: the old
    # table_from_map path re-inherited the O(capacity) costs the active
    # engine was built to kill).
    mine = (id_flat >= gid0) & (id_flat < gid0 + S)
    g_local = jnp.where(mine, id_flat - gid0, 0)
    blk_inv = jnp.full((G + 1,), -1, jnp.int32).at[blk].set(
        jnp.arange(blk.shape[0], dtype=jnp.int32), mode="drop"
    )
    bpos = blk_inv[g_local // B]
    aslot = bpos * B + g_local % B
    # a winner is always inside a gathered block (it was a candidate), but
    # guard anyway: unresolvable ids behave as empty pixels
    local_idx_img = jnp.where(mine & (bpos >= 0), aslot, -1).reshape(H, W)
    assoc = associate_active(
        depth_m, rgb, semantic, local_idx_img, at, pose, T_inv, time, cam, p
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

    # ---- 6. block writeback + ONE combined merge/append scatter ----------
    local, dropped_local = fuse_append_shard(
        local, at, assoc, block_size, n_devices, me
    )

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
        # per-device working set + tail, for overflow repair, growth and the
        # work-proportionality measurement
        "active_per_dev": jax.lax.all_gather(n_active, AXIS),
        "tail_per_dev": jax.lax.all_gather(local.count, AXIS),
        "live_per_dev": jax.lax.all_gather(live_after, AXIS),
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
        # The dense preprocessing runs REPLICATED on every device: on real
        # multi-chip hardware replicated compute costs no extra wall time,
        # while row-sharding the 13x13 stencil chain makes GSPMD insert a
        # halo collective per shifted tap (measured 3-10x slowdown on the
        # virtual mesh).  The sharded body below is where the real
        # distribution happens.
        depth_f = preprocess_frame(depth_raw, semantic, cam, params)
        T_c2l = compose(invert_se3(last_pose), pose)
        depth_m = remove_movings(depth_f, semantic, last_depth, T_c2l, cam, params)
        new_state, stats = sharded(state, depth_m, rgb, semantic, pose, time)
        return new_state, depth_f, stats

    return step


# ---------------------------------------------------------------------------
# Per-shard tombstone compaction + host-side capacity growth
# ---------------------------------------------------------------------------

def _compact_body(state: ShardedMapState) -> ShardedMapState:
    """Order-preserving per-shard compaction: pack live (conf > 0) rows of
    the shard prefix to the front, zero the rest (the per-shard form of
    ops/fusion.py:compact — same relative order, so the global surfel SET
    and per-shard streams match a never-tombstoned run)."""
    S = state.px.shape[0]
    count = state.counts[0]
    lattice = jnp.arange(S, dtype=jnp.int32)
    keep = (state.conf > 0.0) & (lattice < count)
    dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
    idx = jnp.where(keep, dest, S)
    cols = {
        k: jnp.zeros_like(getattr(state, k)).at[idx].set(
            getattr(state, k), mode="drop"
        )
        for k in _COLS
    }
    return ShardedMapState(**cols, counts=jnp.sum(keep.astype(jnp.int32))[None])


def make_compact_step(mesh: Mesh):
    """Jitted on-device compaction of every shard (no host transfer)."""
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    sh = state_sharding(mesh)
    spec_state = jax.tree.map(lambda s: s.spec, sh)
    return jax.jit(
        shard_map(
            _compact_body, mesh=mesh,
            in_specs=(spec_state,), out_specs=spec_state,
            check_vma=False,
        )
    )


def resize_sharded(
    state: ShardedMapState,
    new_capacity: int,
    n_devices: int,
    mesh: Mesh | None = None,
) -> ShardedMapState:
    """Grow every shard's slot range to new_capacity/D, preserving each
    shard's live prefix (host-side; re-jit per capacity bucket, exactly like
    surfels.resize_map on one chip)."""
    cap = state.px.shape[0]
    if new_capacity % n_devices:
        raise ValueError("capacity must divide evenly across devices")
    S_old, S_new = cap // n_devices, new_capacity // n_devices
    if S_new < S_old:
        raise ValueError("sharded map never shrinks")
    cols = {}
    for k in _COLS:
        a = np.asarray(getattr(state, k)).reshape(n_devices, S_old)
        b = np.zeros((n_devices, S_new), a.dtype)
        b[:, :S_old] = a
        cols[k] = jnp.asarray(b.reshape(-1))
    out = ShardedMapState(**cols, counts=state.counts)
    if mesh is not None:
        out = jax.device_put(out, state_sharding(mesh))
    return out


class ShardedMapper:
    """Host driver for the block-sharded engine with the single-chip
    pipeline's robustness guarantees (pipeline.py:24-26): pre-growth so the
    append path can never drop a surfel, batched overflow verification with
    window replay for active-budget truncation, and deferred tombstone
    reclamation via on-device compaction.
    """

    def __init__(
        self,
        mesh: Mesh,
        cam: CameraIntrinsics,
        params: PipelineParams | None = None,
        capacity: int = 1 << 20,
        active_blocks: int = 64,
        block_size: int = 1024,
        sync_every: int = 8,
        compact_dead_frac: float = 0.25,
    ):
        self.mesh = mesh
        self.cam = cam
        self.params = params or PipelineParams()
        self.n_devices = mesh.devices.size
        self.block_size = block_size
        self.active_blocks = active_blocks
        self.sync_every = max(1, min(sync_every, 128))
        self.compact_dead_frac = compact_dead_frac
        cap = self._round_cap(capacity)
        self.state = jax.device_put(
            empty_sharded(cap, self.n_devices), state_sharding(mesh)
        )
        self._steps: dict[tuple[int, int], object] = {}
        self._compactor = make_compact_step(mesh)
        self.last_depth = jnp.zeros((cam.height, cam.width), jnp.float32)
        self.last_pose = jnp.eye(4, dtype=jnp.float32)
        self.tick = 0
        self.ref_frame_set = False
        self._window: list[tuple[tuple, int]] = []
        self._chk = None
        self._pending_stats: list[dict] = []
        self._since_sync = 0
        self._tails = np.zeros(self.n_devices, np.int64)

    # -- capacity bookkeeping ---------------------------------------------

    def _round_cap(self, cap: int) -> int:
        quantum = self.n_devices * self.block_size
        return -(-cap // quantum) * quantum

    @property
    def capacity(self) -> int:
        return self.state.px.shape[0]

    @property
    def shard_slots(self) -> int:
        return self.capacity // self.n_devices

    @property
    def _eff_blocks(self) -> int:
        return min(self.active_blocks, self.shard_slots // self.block_size)

    def _step_fn(self):
        key = (self.capacity, self._eff_blocks)
        if key not in self._steps:
            self._steps[key] = make_sharded_step(
                self.mesh, self.cam, self.params, self.n_devices,
                active_blocks=self._eff_blocks, block_size=self.block_size,
            )
        return self._steps[key]

    def _maybe_grow(self, frames_ahead: int) -> None:
        """Pre-grow so the worst-case ingest of the unverified window fits in
        EVERY shard (round-robin dealing bounds a shard's share of one frame
        at ceil(Vp / D) + 1)."""
        Vp = (self.cam.height * self.cam.width) // 2
        per_frame = -(-Vp // self.n_devices) + 1
        need = int(self._tails.max()) + frames_ahead * per_frame
        if need <= self.shard_slots:
            return
        self._sync()
        need = int(self._tails.max()) + frames_ahead * per_frame
        new_slots = self.shard_slots
        while need > new_slots:
            new_slots *= 2
        if new_slots > self.shard_slots:
            self.state = resize_sharded(
                self.state, new_slots * self.n_devices, self.n_devices,
                self.mesh,
            )

    # -- sync / verify / repair -------------------------------------------

    def _read_pending(self) -> np.ndarray:
        """ONE stacked fixed-shape transfer of every pending stat the sync
        needs: rows of [peak_active, dropped, tail_per_dev..., live_per_dev
        ...].  Per-stat ``int(jnp.max(...))`` reads each pay a full tunnel
        round trip on a deferred-dispatch backend (the poison the single-chip
        ``_repair_overflow`` batches away); padding to sync_every rows keeps
        the stack a single cached executable."""
        rows = [
            jnp.concatenate([
                jnp.stack([jnp.max(s["active_per_dev"]), s["dropped"]]),
                s["tail_per_dev"],
                s["live_per_dev"],
            ])
            for s in self._pending_stats
        ]
        k = len(rows)
        pad = max(1, self.sync_every) - k
        rows = rows + [rows[0]] * max(pad, 0)
        return np.asarray(jnp.stack(rows))[:k]

    def _sync(self) -> None:
        """Drain pending stats; verify the window (budget truncation + drops)
        and repair by replay with a grown budget, exactly like the
        single-chip _repair_overflow.  All device reads ride ONE stacked
        transfer per attempt (see :meth:`_read_pending`)."""
        rows = None
        for _ in range(32):
            if not self._window:
                break
            rows = self._read_pending()
            peaks = rows[:, 0].astype(np.int64)
            effs = [eff for (_, eff) in self._window]
            if all(a <= e for a, e in zip(peaks, effs)):
                break
            peak = int(peaks.max())
            while self.active_blocks < peak:
                self.active_blocks *= 2
            state = self._chk
            for i, (inp, _) in enumerate(self._window):
                eff = self._eff_blocks
                step = self._step_fn()  # same shapes as the checkpoint
                state, last_depth, stats = step(state, *inp)
                self._pending_stats[i] = stats
                self._window[i] = (inp, eff)
            self.state = state
            self.last_depth = last_depth
            rows = None
        else:
            raise RuntimeError("sharded budget repair did not converge (bug)")

        if self._pending_stats:
            if rows is None:
                rows = self._read_pending()
            dropped = int(rows[:, 1].sum())
            if dropped:
                raise RuntimeError(
                    f"sharded append dropped {dropped} surfels — pre-growth "
                    "margin violated (bug)"
                )
            D = self.n_devices
            self._tails = rows[-1, 2:2 + D].astype(np.int64)
            self._live = rows[-1, 2 + D:2 + 2 * D].astype(np.int64)
            dead = int(self._tails.sum() - self._live.sum())
            if dead > self.compact_dead_frac * self.capacity:
                self.state = self._compactor(self.state)
                self._tails = np.asarray(self.state.counts, np.int64)
        self._pending_stats = []
        self._window = []
        self._chk = None
        self._since_sync = 0

    @property
    def count(self) -> int:
        self._sync()
        return int(jnp.sum(self.state.conf > 0.0))

    def smap(self) -> SurfelMap:
        """Gathered, compacted single-map view (checkpoint / render)."""
        self._sync()
        return gather_sharded_map(self.state, self.n_devices)

    def save_map(self, path: str, start_id: int = 0, end_id: int = 0) -> None:
        """Gather every shard's live prefix and write the reference binary
        map format (same bytes a single-chip run would produce for the same
        surfel set; shard interleaving changes surfel ORDER only)."""
        from ..surfels import save_map as _save

        _save(self.smap(), path, start_id, end_id)

    def reset(self) -> None:
        """Clear the model (keep the reference frame) — the sharded
        counterpart of SurfelMapper.reset."""
        self.state = jax.device_put(
            empty_sharded(self.capacity, self.n_devices),
            state_sharding(self.mesh),
        )
        self.tick = 0
        self._window = []
        self._pending_stats = []
        self._chk = None
        self._since_sync = 0
        self._tails = np.zeros(self.n_devices, np.int64)

    def active_table(self, pose):
        """In-frustum active table for ICP/BA at ``pose`` (camera-to-world).

        The sharded map has no single-chip block layout, so this gathers the
        live surfels (a host sync) and runs the same plan/gather machinery
        the single-chip mapper uses.  Cost: one cross-shard gather per call —
        fine for a per-frame ICP refine, but callers batching many poses
        should reuse one table while frusta overlap."""
        from ..ops.active import gather_active as _ga
        from ..surfels import resize_map

        pose = jnp.asarray(np.asarray(pose), jnp.float32)
        smap = self.smap()
        bs = self.block_size
        cap = -(-max(int(smap.count), 1) // bs) * bs
        smap = resize_map(smap, cap)
        G = cap // bs
        T_inv = invert_se3(pose)
        blk, n_active = plan_active_blocks(
            smap, T_inv, self.cam, self.params, G, bs
        )
        return _ga(smap, blk, bs)

    # -- frame ingestion ---------------------------------------------------

    def process_frame(self, rgb, depth, semantic, pose) -> dict:
        """Same frame-0 seeding contract as the single-chip SurfelMapper."""
        rgb_np = rgb if isinstance(rgb, jax.Array) else np.asarray(rgb)
        if jnp.issubdtype(rgb_np.dtype, jnp.integer):
            rgb = jnp.asarray(rgb_np).astype(jnp.float32) / 255.0
        else:
            rgb = jnp.asarray(rgb_np, jnp.float32)
        depth = jnp.asarray(np.asarray(depth).astype(np.uint16))
        semantic = jnp.asarray(np.asarray(semantic)).astype(jnp.int32)
        pose = jnp.asarray(np.asarray(pose), jnp.float32)

        if not self.ref_frame_set:
            self.last_depth = preprocess_frame(
                depth, semantic, self.cam, self.params
            )
            self.last_pose = pose
            self.ref_frame_set = True
            self.tick += 1
            return {"first_frame": True}

        self._maybe_grow(self.sync_every - self._since_sync + 1)
        if not self._window:
            self._chk = self.state
        t = jnp.float32(self.tick)
        inp = (depth, rgb, semantic, pose, self.last_depth, self.last_pose, t)
        step = self._step_fn()
        self.state, self.last_depth, stats = step(self.state, *inp)
        self._window.append((inp, self._eff_blocks))
        self._pending_stats.append(stats)
        self.last_pose = pose
        self.tick += 1
        # host-side worst-case tail advance (true tails read at sync)
        Vp = (self.cam.height * self.cam.width) // 2
        self._tails = self._tails + (-(-Vp // self.n_devices) + 1)
        self._since_sync += 1
        if self._since_sync >= self.sync_every:
            self._sync()
        return stats


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
