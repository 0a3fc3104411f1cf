"""SurfelMapper: the per-frame pipeline driver (reference API parity).

TPU-native counterpart of src/SurfelMapping.{h,cpp}.  The reference sequences
~14 GL passes with a glFinish after each (src/SurfelMapping.cpp:115-251);
here the whole frame is ONE jitted function — XLA fuses and schedules the
stages, and the only host sync is the optional overflow check.

Behavioural contract reproduced exactly:
  * frame 0 only seeds the LAST depth image + lastPose and returns
    (src/SurfelMapping.cpp:142-154) — the map starts empty and fills through
    the new-unstable path of association on frame 1+;
  * the tick==0 initialize branch is only reachable after reset()
    (src/SurfelMapping.cpp:161-168, build_map.cpp:258-263);
  * per-frame stage order: preprocess -> movings -> [conflict ->
    conf-update -> compact] -> index map -> associate -> fuse -> append
    (src/SurfelMapping.cpp:171-242).  The reference's second backMapping and
    its 2-3 buildModelMap texture rebuilds are artifacts of the VBO/texture
    mirror and have no SoA equivalent (fusing never drops confidence, so the
    second compaction is a provable no-op);
  * cleanPoints: metricize only (no filtering), conflict with
    maxDepth = farClip - 15, fuseThresh = 0.1, isClean = 1
    (src/SurfelMapping.cpp:496-532).

Capacity discipline: the map is a fixed-capacity buffer under jit; when a
frame would overflow, the host grows the buffer (bucketed, re-jits once per
bucket) and replays the frame — no surfel is ever dropped.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .config import CameraIntrinsics, MapConfig, PipelineParams
from .ops.active import (
    associate_active,
    conflict_active,
    fuse_append_map,
    gather_active,
    index_active,
    plan_active_blocks,
)
from .ops.frame_surfels import feedback_surfels
from .ops.fusion import compact, conflict_pass, initialize_map
from .ops.preprocess import metricize_depth, preprocess_frame, remove_movings
from .ops.transforms import compose, invert_se3
from .surfels import SurfelMap, empty_map, load_map, resize_map, save_map
from .utils.stopwatch import Stopwatch


# ---------------------------------------------------------------------------
# Jitted step functions (pure; static over cam/params/capacity)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cam", "params"))
def _preprocess_only(
    depth_raw: jax.Array,
    semantic: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
) -> jax.Array:
    """Frame-0 path: produce the LAST depth image only."""
    return preprocess_frame(depth_raw, semantic, cam, params)


@functools.partial(jax.jit, static_argnames=("cam", "params"))
def _init_step(
    smap: SurfelMap,
    depth_raw: jax.Array,
    rgb: jax.Array,
    semantic: jax.Array,
    pose: jax.Array,
    last_depth: jax.Array,
    last_pose: jax.Array,
    time: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
):
    """tick==0 (post-reset) path: preprocess + movings + feedback-buffer init
    (src/SurfelMapping.cpp:161-168)."""
    filtered = preprocess_frame(depth_raw, semantic, cam, params)
    T_c2l = compose(invert_se3(last_pose), pose)
    depth_m = remove_movings(filtered, semantic, last_depth, T_c2l, cam, params)
    frame = feedback_surfels(depth_m, rgb, semantic, cam, params)
    smap, dropped = initialize_map(smap, frame, pose, time)
    return smap, filtered, dropped


@functools.partial(
    jax.jit,
    static_argnames=("cam", "params", "active_blocks", "block_size"),
    donate_argnames=("smap",),
)
def _fusion_step(
    smap: SurfelMap,
    depth_raw: jax.Array,
    rgb: jax.Array,
    semantic: jax.Array,
    pose: jax.Array,
    last_depth: jax.Array,
    last_pose: jax.Array,
    time: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
    active_blocks: int,
    block_size: int,
):
    """The incremental fusion step (tick > 0), active-block engine.

    Reference stage order preserved (src/SurfelMapping.cpp:171-242):
    preprocess -> movings -> conflict(+deferred removal) -> index map ->
    associate -> fuse -> append.  All indexed memory traffic runs on the
    gathered in-frustum active table (ops/active.py), so the frame costs
    O(in-view surfels) instead of round 1's O(capacity); removal is
    tombstoned (conf <= 0) and reclaimed by the host's deferred compaction.
    """
    filtered = preprocess_frame(depth_raw, semantic, cam, params)
    T_c2l = compose(invert_se3(last_pose), pose)
    depth_m = remove_movings(filtered, semantic, last_depth, T_c2l, cam, params)
    T_inv = invert_se3(pose)

    blk, n_active = plan_active_blocks(
        smap, T_inv, cam, params, active_blocks, block_size
    )
    at = gather_active(smap, blk, block_size)

    at, removed = conflict_active(
        at,
        depth_m,
        semantic,
        T_inv,
        cam,
        params,
        min_depth=params.near_clip,
        max_depth=params.far_clip,
        fuse_thresh=params.fuse_thresh_factor,
        is_clean=False,
    )

    idx_img = index_active(at, T_inv, time, cam, params)
    assoc = associate_active(
        depth_m, rgb, semantic, idx_img, at, pose, T_inv, time, cam, params
    )
    # smap is DONATED (in-place XLA updates of the 11 map columns); the
    # merge + append land in ONE combined scatter (ops/active.py
    # fuse_append_map) instead of fuse-into-table + staging-append
    smap, dropped = fuse_append_map(smap, at, assoc, block_size)

    stats = {
        "removed": removed,
        "merged": jnp.sum(assoc.mark >= 0),
        "new": jnp.sum(assoc.mark == -1),
        "count": jnp.sum(smap.conf > 0.0),  # live (tombstones excluded)
        "active_blocks": n_active,
    }
    return smap, filtered, dropped, stats


@functools.partial(jax.jit, static_argnames=("cam", "params"))
def _clean_step(
    smap: SurfelMap,
    depth_raw: jax.Array,
    semantic: jax.Array,
    pose: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
):
    """Backward ghost-removal pass (src/SurfelMapping.cpp:496-532)."""
    depth_m = metricize_depth(depth_raw, cam, params)
    T_inv = invert_se3(pose)
    new_conf = conflict_pass(
        smap,
        depth_m,
        semantic,
        T_inv,
        cam,
        params,
        min_depth=params.near_clip,
        max_depth=params.far_clip - 15.0,
        fuse_thresh=params.clean_fuse_thresh_factor,
        is_clean=True,
    )
    smap = dataclasses.replace(smap, conf=new_conf)
    return compact(smap)


@functools.partial(
    jax.jit, static_argnames=("cam", "params", "active_blocks", "block_size")
)
def _gather_active_for(
    smap: SurfelMap,
    pose: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
    active_blocks: int,
    block_size: int,
):
    """Plan + gather the active table for an arbitrary camera pose (the
    fusion step's working-set machinery exposed to ICP / windowed BA).

    Also returns the TRUE active-block count so the caller can detect a
    truncated gather (n_active > active_blocks) and re-gather with a grown
    budget — pose estimates from a truncated table would otherwise never be
    repaired (unlike fusion steps, which _repair_overflow replays)."""
    T_inv = invert_se3(pose)
    blk, n_active = plan_active_blocks(
        smap, T_inv, cam, params, active_blocks, block_size
    )
    return gather_active(smap, blk, block_size), n_active


# ---------------------------------------------------------------------------
# Host-side driver
# ---------------------------------------------------------------------------

class SurfelMapper:
    """Host orchestrator with the reference's SurfelMapping API surface
    (processFrame / cleanPoints / reset / acquireImages analogues +
    checkpoint IO)."""

    def __init__(
        self,
        cam: CameraIntrinsics,
        params: PipelineParams | None = None,
        map_config: MapConfig | None = None,
        sync_every: int = 8,
    ):
        self.cam = cam
        self.params = params or PipelineParams()
        self.map_config = map_config or MapConfig()
        if cam.height % 2 or cam.width % 2:
            raise ValueError(
                "active-block engine needs even image dims (checkerboard "
                f"slicing); got {cam.width}x{cam.height} — pad the frames"
            )
        self.stopwatch = Stopwatch()
        # requested active-block budget; effective value is min(this, #blocks)
        self.active_blocks = self.map_config.active_blocks
        # Host<->device sync discipline: the reference reads back a count after
        # every stage (glGetQueryObjectuiv + glFinish); we only sync every
        # ``sync_every`` frames and pre-grow the buffer by the worst-case
        # ingest (H*W/2 per frame) for the frames in between, so the XLA
        # stream never stalls on the host.
        # clamp: the buffer pre-grows by sync_every * H*W/2 worst-case slots,
        # so an unbounded value would balloon capacity.  Memory note: the
        # replay window (_repair_overflow) also RETAINS every frame's staged
        # device inputs (f32 rgb + depth + semantic + prev_depth, ~10 MB per
        # KITTI frame) plus one map snapshot until the next sync — raising
        # sync_every trades host-sync stalls for up to sync_every x 10 MB of
        # HBM held by the window.
        self.sync_every = max(1, min(sync_every, 128))
        self.reset_all()

    # -- state management ---------------------------------------------------

    def reset_all(self) -> None:
        """Fresh engine: empty map, no reference frame."""
        H, W = self.cam.height, self.cam.width
        self._smap = empty_map(self.map_config.rounded_capacity(self.map_config.capacity))
        self.last_depth = jnp.zeros((H, W), jnp.float32)
        self.last_pose = jnp.eye(4, dtype=jnp.float32)
        self.tick = 0
        self.ref_frame_set = False
        self.history_poses: list[np.ndarray] = []
        self.last_stats: dict[str, Any] = {}
        # host-event observability: costly out-of-band events that explain
        # throughput anomalies (window replays, budget growth, compaction,
        # capacity growth) — read by the dip probe / --profile
        self.events = {"replays": 0, "budget_growths": 0, "compacts": 0,
                       "capacity_growths": 0, "peak_active": 0}
        self._cached_count = 0   # live surfels (tombstones excluded)
        self._cached_tail = 0    # allocation cursor (smap.count)
        self._since_sync = 0
        self._pending_dropped = []
        self._pending_active = []
        # Budget-overflow guard (see _repair_overflow): the map/depth/pose
        # state at the start of the current unverified frame window (a free
        # snapshot — jax arrays are immutable) + each window frame's staged
        # inputs and dispatched budget.
        self._chk = None
        self._window = []

    @property
    def _effective_active_blocks(self) -> int:
        return min(self.active_blocks, self._smap.capacity // self.map_config.block_size)

    def reset(self) -> None:
        """Map reset (src/SurfelMapping.cpp:436-441): clears the model and
        tick but keeps the reference frame, so the next frame takes the
        tick==0 initialize path."""
        self._smap = empty_map(self._smap.capacity)
        self.tick = 0
        self.history_poses = []
        self._cached_count = 0
        self._cached_tail = 0
        self._pending_dropped = []
        self._pending_active = []
        self._since_sync = 0
        self._chk = None
        self._window = []

    @property
    def smap(self) -> SurfelMap:
        """The surfel map, compacted for external consumption.

        The internal map (``self._smap``) defers removal: conflict kills are
        tombstones (conf <= 0) reclaimed lazily (ops/active.py).  Reading
        this property drains pending device flags and compacts, so external
        consumers always see exactly what the reference's per-frame
        back-mapping would have produced (same surfels, same order).

        LIFETIME: the returned map aliases the live internal buffers, and
        ``process_frame`` DONATES them to XLA — the next frame invalidates
        any map read here (``np.asarray`` on a stale reference raises
        "Array has been deleted").  Consume it before the next frame, or
        take :meth:`snapshot` to hold one across frames."""
        self._refresh_counts()
        if self._cached_tail != self._cached_count:
            self._compact_now()
        return self._smap

    def snapshot(self) -> SurfelMap:
        """A defensive deep copy of :attr:`smap` that survives donation:
        safe to hold across subsequent ``process_frame`` calls (GUI /
        metrics loops).  Costs one device-side copy of the map columns."""
        return jax.tree_util.tree_map(jnp.copy, self.smap)

    @smap.setter
    def smap(self, value: SurfelMap) -> None:
        self._smap = value

    @property
    def count(self) -> int:
        """Live surfel count (a host sync point)."""
        self._refresh_counts()
        return self._cached_count

    def _padded(self, scalars: list) -> list:
        """Pad a pending-scalar list to sync_every entries so the stacked
        read has ONE shape (each distinct stack length is its own cached
        executable — variable window lengths were compiling inside timed
        bench windows)."""
        pad = self.sync_every - len(scalars)
        return scalars + [scalars[0]] * max(pad, 0)

    def _compact_now(self) -> None:
        # compact only the pow2 bucket covering the allocation cursor: every
        # written slot is below the tail, so the result is identical and the
        # 11 column scatters cost O(bucket) not O(capacity) (the full-width
        # form's ~1.4 s at a 16 M allocation WAS the BENCH_r04 mid-run dip)
        self.events["compacts"] += 1
        cfg = self.map_config
        bucket = cfg.rounded_capacity(max(self._cached_tail, 1))
        b2 = cfg.block_size
        while b2 < bucket:
            b2 *= 2
        bucket = min(b2, self._smap.capacity)
        self._smap = compact(self._smap, prefix=bucket)
        self._cached_tail = int(self._smap.count)
        assert self._cached_tail == self._cached_count, (
            "compaction changed the live count — tombstone accounting bug"
        )

    def _repair_overflow(self) -> None:
        """Verify the unverified frame window and repair budget overflows.

        Each fusion step's true active-block count (part of its stats) is
        read here in one batch — per-frame reads are poison on a deferred-
        dispatch backend, so the check piggybacks on the periodic sync.  If
        any frame ran with a truncated working set (budget < true count), the
        budget grows and the WHOLE window is replayed from the retained
        checkpoint (an explicit device copy taken once per window — the step
        donates its map input, so the pre-window state must be preserved by
        value).  The result
        is bit-identical to a run that never overflowed, so budget overflow
        is never a silent correctness erosion (round-2 weakness #5).  Repair
        loops because the replayed (correct) maps can expose a still-larger
        working set than the truncated run reported."""
        cfg = self.map_config
        for _ in range(32):  # paranoid bound; budget growth is monotone
            if not self._window:
                return
            # ONE stacked transfer: per-scalar int() reads each pay a full
            # tunnel round trip (measured ~0.3-0.5 s of pure RTT per sync at
            # sync_every=16)
            acts = np.asarray(jnp.stack(self._padded(self._pending_active)))[
                : len(self._pending_active)
            ].tolist()
            effs = [eff for (_, eff) in self._window]
            self.events["peak_active"] = max(
                self.events["peak_active"], max(acts)
            )
            if all(a <= e for a, e in zip(acts, effs)):
                return
            peak = max(acts)
            self.events["replays"] += 1
            while self.active_blocks < peak:
                self.active_blocks *= 2
                self.events["budget_growths"] += 1
            # replay consumes (donates) its starting map — copy the retained
            # checkpoint so a further repair round can replay again
            smap = jax.tree.map(jnp.copy, self._chk)
            for i, (inp, _) in enumerate(self._window):
                eff = self._effective_active_blocks
                smap, filtered, dropped, stats_dev = _fusion_step(
                    smap, *inp, self.cam, self.params, eff, cfg.block_size,
                )
                self._pending_dropped[i] = dropped
                self._pending_active[i] = stats_dev["active_blocks"]
                self._window[i] = (inp, eff)
            self._smap = smap
            self.last_depth = filtered
        raise RuntimeError("active-budget repair did not converge (bug)")

    def _refresh_counts(self) -> None:
        """Periodic host sync: verify/repair the frame window, drain pending
        overflow flags, cache counts, apply the deferred-compaction policy
        and active-budget growth."""
        self._repair_overflow()
        if self._pending_dropped:
            k = len(self._pending_dropped)
            total = int(
                np.asarray(jnp.stack(self._padded(self._pending_dropped)))[:k].sum()
            )
            self._pending_dropped = []
            if total:
                raise RuntimeError(
                    f"surfel buffer overflow dropped {total} surfels — "
                    "pre-growth margin violated (bug)"
                )
        if self._pending_active:
            k = len(self._pending_active)
            peak = int(
                np.asarray(jnp.stack(self._padded(self._pending_active)))[:k].max()
            )
            self._pending_active = []
            # Right-size the budget to the measured working set: every table
            # stage (gather/conflict/index/associate/fuse/writeback) costs
            # linearly in the gathered slot count, so an oversized budget is
            # a direct fps tax (measured: a 1024-block budget at a 143-block
            # working set wastes ~60 ms/frame).  Wide hysteresis (grow at
            # 0.75 occupancy, shrink at 3x slack) because each pow2 bucket is
            # its own XLA executable and compiles are expensive — oscillation
            # would thrash the jit cache.  Undershoot is exactly repaired by
            # _repair_overflow, never silent.
            eff = self._effective_active_blocks
            cfg_ = self.map_config
            if cfg_.freeze_active_budget:
                pass  # pinned; overflow repair alone may grow it
            elif peak > cfg_.active_watermark * eff:
                target = max(eff, 64)
                while peak > cfg_.active_watermark * target:
                    target *= 2
                self.active_blocks = target
            elif peak * 3 < eff and eff > 64:
                self.active_blocks = max(64, eff // 2)
        self._chk = None
        self._window = []
        tail_live = np.asarray(jnp.stack([
            self._smap.count,
            jnp.sum(self._smap.conf > 0.0).astype(jnp.int32),
        ]))  # one transfer, not two round trips
        self._cached_tail = int(tail_live[0])
        self._cached_count = int(tail_live[1])
        self._since_sync = 0
        cfg = self.map_config
        dead = self._cached_tail - self._cached_count
        # Reclaim tombstones only under ALLOCATION PRESSURE (the cursor
        # nearing the growth watermark), not on dead fraction alone: a
        # pre-sized capacity absorbs tombstones for free (the active-block
        # plan gates on conf > 0, so dead slots never re-activate blocks —
        # measured: peak_active stayed flat at 327 across 100 frames while
        # 5 M tombstones accumulated), whereas an eager compact is a
        # 100s-of-ms stall in the middle of mapping (BENCH_r04's 8.7 fps
        # band).  Growth (_maybe_grow_cached) and external reads (smap /
        # checkpoint / clean) still compact unconditionally.
        if (
            dead > cfg.compact_dead_frac * self._smap.capacity
            and self._cached_tail > 0.75 * self._smap.capacity
        ):
            self._compact_now()

    def _maybe_grow_cached(self, need: int) -> None:
        cfg = self.map_config
        cap = self._smap.capacity
        if need <= cap * cfg.watermark:
            return
        # reclaim tombstones before buying memory
        self._refresh_counts()
        if self._cached_tail > self._cached_count:
            dead = self._cached_tail - self._cached_count
            self._compact_now()
            need = max(self._cached_tail, need - dead)
        new_cap = cap
        while need > new_cap * cfg.watermark:
            new_cap = int(new_cap * cfg.growth_factor)
        new_cap = cfg.rounded_capacity(new_cap)
        if new_cap > cap:
            self._smap = resize_map(self._smap, new_cap)

    def _maybe_grow(self, needed_extra: int = 0) -> None:
        self._maybe_grow_cached(int(self._smap.count) + needed_extra)

    def active_table(self, pose):
        """Gather the in-frustum active table for an external consumer (ICP /
        windowed BA) at the same O(in-view) cost the fusion step pays — NOT
        an O(capacity) full-map view.  ``pose`` is camera-to-world.

        Never truncated: if the pose's true active-block count exceeds the
        current budget, the budget grows and the gather repeats (one extra
        host read per retry — acceptable here, active_table is a sync point
        already via _repair_overflow)."""
        self._repair_overflow()
        pose = jnp.asarray(np.asarray(pose), jnp.float32)
        while True:
            eff = self._effective_active_blocks
            at, n_active = _gather_active_for(
                self._smap, pose, self.cam, self.params,
                eff, self.map_config.block_size,
            )
            n = int(n_active)
            if n <= eff or eff >= self._smap.capacity // self.map_config.block_size:
                return at
            while self.active_blocks < n:
                self.active_blocks *= 2

    def local_model(self, rgb, depth, semantic, pose) -> SurfelMap:
        """The frame's UNFUSED local surfel cloud in world frame — the
        reference's per-frame inspection surface
        (GlobalModel::getLocalSurfelModel + genLSM.vert/.geom,
        src/SurfelMapping.cpp:200-210 / src/GlobalModel.cpp:1077-1176).
        Every valid pixel becomes a surfel in reference uv column-major
        lattice order; nothing is associated or written to the map.  Used by
        the GUI's local-model panel mode and debugging."""
        from .ops.local_model import local_surfel_model

        rgb, depth, semantic, pose = self._to_device(rgb, depth, semantic, pose)
        depth_m = metricize_depth(depth, self.cam, self.params)
        return local_surfel_model(
            depth_m, rgb, semantic, pose, jnp.float32(self.tick),
            self.cam, self.params,
        )

    # -- frame ingestion ----------------------------------------------------

    def _to_device(self, rgb, depth, semantic, pose):
        """Stage a frame on device.

        Uploads the NARROW dtypes (u8 rgb/semantic, u16 depth) and widens on
        device — host->device bandwidth is the scarce resource (the reference
        pays the same discipline with its u8/u16 texture uploads,
        src/SurfelMapping.cpp:122-128).  Already-staged jax arrays pass
        through untouched so callers can pre-stage (e.g. the prefetcher)."""
        if isinstance(rgb, jax.Array):
            rgb_dev = rgb
        else:
            rgb_np = np.asarray(rgb)
            if rgb_np.dtype != np.uint8 and np.issubdtype(rgb_np.dtype, np.integer):
                rgb_np = rgb_np.astype(np.uint8)
            rgb_dev = jnp.asarray(rgb_np)
        if jnp.issubdtype(rgb_dev.dtype, jnp.integer):
            rgb_dev = rgb_dev.astype(jnp.float32) / 255.0
        elif rgb_dev.dtype != jnp.float32:
            rgb_dev = rgb_dev.astype(jnp.float32)

        if isinstance(depth, jax.Array):
            depth_dev = depth
        else:
            depth_dev = jnp.asarray(np.asarray(depth).astype(np.uint16))

        if isinstance(semantic, jax.Array):
            sem_dev = (
                semantic if semantic.dtype == jnp.int32
                else semantic.astype(jnp.int32)
            )
        else:
            sem_np = np.asarray(semantic)
            if sem_np.dtype not in (np.uint8, np.int8):
                if sem_np.max(initial=0) < 256 and sem_np.min(initial=0) >= 0:
                    sem_np = sem_np.astype(np.uint8)
            sem_dev = jnp.asarray(sem_np).astype(jnp.int32)

        if isinstance(pose, jax.Array):
            # passthrough — np.asarray on a staged pose is a blocking
            # device->host read that DRAINS the deferred-dispatch queue
            # every frame (measured ~50 ms/frame of pure pipeline stall)
            if pose.dtype != jnp.float32:
                pose = pose.astype(jnp.float32)
        else:
            pose = jnp.asarray(np.asarray(pose), jnp.float32)
        return rgb_dev, depth_dev, sem_dev, pose

    def stage_frame(self, rgb, depth, semantic, pose):
        """Pre-stage a frame's arrays on device (for prefetch pipelines)."""
        return self._to_device(rgb, depth, semantic, pose)

    def process_frame(self, rgb, depth, semantic, pose) -> dict[str, Any]:
        """Ingest one frame (reference processFrame,
        src/SurfelMapping.cpp:115-251).  ``pose`` is the ground-truth (or
        ICP-refined) camera-to-world 4x4.  Returns per-frame stats."""
        sw = self.stopwatch
        # record the pose for history BEFORE staging: np.asarray on an
        # already-staged device pose is a blocking device->host read that
        # drains the whole deferred-dispatch queue every frame (measured:
        # the chained step costs ~84 ms but the frame loop paid ~190 ms —
        # this sync was most of the difference)
        pose_host = pose if isinstance(pose, np.ndarray) else None
        rgb, depth, semantic, pose = self._to_device(rgb, depth, semantic, pose)
        if pose_host is None:
            pose_host = pose  # keep the device array; consumers convert lazily

        if not self.ref_frame_set:
            with sw.time("Preprocess"):
                self.last_depth = _preprocess_only(
                    depth, semantic, self.cam, self.params
                )
            self.last_pose = pose
            self.ref_frame_set = True
            self.history_poses.append(pose_host)
            self.tick += 1
            self.last_stats = {"count": self.count, "first_frame": True}
            return self.last_stats

        time = jnp.float32(self.tick)
        if self.tick == 0:
            # only reachable after reset()
            with sw.time("Initialize"):
                while True:
                    smap, filtered, dropped = _init_step(
                        self._smap, depth, rgb, semantic, pose,
                        self.last_depth, self.last_pose, time,
                        self.cam, self.params,
                    )
                    if int(dropped) == 0:
                        break
                    self._maybe_grow(int(dropped))
            self._smap = smap
            self._refresh_counts()
            stats = {"count": self._cached_count, "initialized": True}
        else:
            # pre-grow so overflow is impossible until the next periodic sync
            max_new = (self.cam.height * self.cam.width) // 2 + 1
            frames_ahead = self.sync_every - self._since_sync + 1
            self._maybe_grow_cached(self._cached_tail + frames_ahead * max_new)
            eff = self._effective_active_blocks
            prev_smap, prev_depth, prev_pose = self._smap, self.last_depth, self.last_pose
            if not self._window:
                # the step donates (consumes) its map input — snapshot the
                # pre-window state by VALUE so overflow repair can replay.
                # One ~map-sized device copy per sync window (~1 ms/16
                # frames), bought back many times over by in-place updates.
                self._chk = jax.tree.map(jnp.copy, prev_smap)
            with sw.time("Run"):
                smap, filtered, dropped, stats_dev = _fusion_step(
                    prev_smap, depth, rgb, semantic, pose,
                    prev_depth, prev_pose, time,
                    self.cam, self.params,
                    eff, self.map_config.block_size,
                )
            self._smap = smap
            n_act = stats_dev.pop("active_blocks")
            self._window.append(
                ((depth, rgb, semantic, pose, prev_depth, prev_pose, time), eff)
            )
            self._pending_dropped.append(dropped)
            self._pending_active.append(n_act)
            self._since_sync += 1
            if self._since_sync >= self.sync_every:
                self._refresh_counts()
            stats = {k: v for k, v in stats_dev.items()}

        self.last_depth = filtered
        self.last_pose = pose
        self.history_poses.append(pose_host)
        self.tick += 1
        self.last_stats = stats
        return stats

    def clean_points(self, depth, semantic, pose) -> None:
        """Backward ghost-removal replay (reference cleanPoints)."""
        self._refresh_counts()
        _, depth, semantic, pose = self._to_device(
            np.zeros((1, 1, 3)), depth, semantic, pose
        )
        with self.stopwatch.time("Clean Points"):
            self._smap = _clean_step(
                self._smap, depth, semantic, pose, self.cam, self.params
            )
        # _clean_step compacts, so tail == live afterwards
        self._pending_dropped = []
        self._pending_active = []
        self._cached_tail = self._cached_count = int(self._smap.count)
        self._since_sync = 0

    # -- persistence --------------------------------------------------------

    def save_map(self, path: str, start_id: int = 0, end_id: int = 0) -> None:
        save_map(self.smap, path, start_id, end_id)  # property compacts

    def load_map(self, path: str) -> tuple[int, int]:
        smap, start_id, end_id = load_map(path)
        cap = self.map_config.capacity
        while smap.capacity > cap * self.map_config.watermark:
            cap = int(cap * self.map_config.growth_factor)
        self._smap = resize_map(smap, self.map_config.rounded_capacity(cap))
        self._refresh_counts()
        self.tick = end_id + 1
        self.ref_frame_set = True
        return start_id, end_id
