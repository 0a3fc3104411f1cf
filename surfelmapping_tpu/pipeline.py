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
from .ops.association import associate
from .ops.frame_surfels import feedback_surfels
from .ops.fusion import (
    append_new,
    compact,
    conflict_pass,
    fuse_scatter,
    initialize_map,
)
from .ops.index_map import build_index_map
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


@functools.partial(jax.jit, static_argnames=("cam", "params"))
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
):
    """The incremental fusion step (tick > 0)."""
    filtered = preprocess_frame(depth_raw, semantic, cam, params)
    T_c2l = compose(invert_se3(last_pose), pose)
    depth_m = remove_movings(filtered, semantic, last_depth, T_c2l, cam, params)
    T_inv = invert_se3(pose)

    count_before = smap.count

    # conflict -> confidence decrement -> compaction
    new_conf = conflict_pass(
        smap,
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
    smap = dataclasses.replace(smap, conf=new_conf)
    smap = compact(smap)
    count_after_conflict = smap.count

    # projective association against the compacted model
    idx_img = build_index_map(smap, T_inv, time, cam, params)
    assoc = associate(
        depth_m, rgb, semantic, idx_img, smap, pose, T_inv, time, cam, params
    )

    smap = fuse_scatter(smap, assoc)
    smap, dropped = append_new(smap, assoc)

    stats = {
        "removed": count_before - count_after_conflict,
        "merged": jnp.sum(assoc.mark >= 0),
        "new": jnp.sum(assoc.mark == -1),
        "count": smap.count,
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
        self.stopwatch = Stopwatch()
        # Host<->device sync discipline: the reference reads back a count after
        # every stage (glGetQueryObjectuiv + glFinish); we only sync every
        # ``sync_every`` frames and pre-grow the buffer by the worst-case
        # ingest (H*W/2 per frame) for the frames in between, so the XLA
        # stream never stalls on the host.
        self.sync_every = max(1, sync_every)
        self.reset_all()

    # -- state management ---------------------------------------------------

    def reset_all(self) -> None:
        """Fresh engine: empty map, no reference frame."""
        H, W = self.cam.height, self.cam.width
        self.smap = empty_map(self.map_config.capacity)
        self.last_depth = jnp.zeros((H, W), jnp.float32)
        self.last_pose = jnp.eye(4, dtype=jnp.float32)
        self.tick = 0
        self.ref_frame_set = False
        self.history_poses: list[np.ndarray] = []
        self.last_stats: dict[str, Any] = {}
        self._cached_count = 0
        self._since_sync = 0
        self._pending_dropped = []

    def reset(self) -> None:
        """Map reset (src/SurfelMapping.cpp:436-441): clears the model and
        tick but keeps the reference frame, so the next frame takes the
        tick==0 initialize path."""
        self.smap = empty_map(self.smap.capacity)
        self.tick = 0
        self.history_poses = []

    @property
    def count(self) -> int:
        self._refresh_counts()
        return self._cached_count

    def _refresh_counts(self) -> None:
        """Periodic host sync: drain pending overflow flags + cache count."""
        if self._pending_dropped:
            total = sum(int(d) for d in self._pending_dropped)
            self._pending_dropped = []
            if total:
                raise RuntimeError(
                    f"surfel buffer overflow dropped {total} surfels — "
                    "pre-growth margin violated (bug)"
                )
        self._cached_count = int(self.smap.count)
        self._since_sync = 0

    def _maybe_grow_cached(self, need: int) -> None:
        cfg = self.map_config
        cap = self.smap.capacity
        if need <= cap * cfg.watermark:
            return
        new_cap = cap
        while need > new_cap * cfg.watermark:
            new_cap = int(new_cap * cfg.growth_factor)
        self.smap = resize_map(self.smap, new_cap)

    def _maybe_grow(self, needed_extra: int = 0) -> None:
        self._maybe_grow_cached(int(self.smap.count) + needed_extra)

    # -- frame ingestion ----------------------------------------------------

    def _to_device(self, rgb, depth, semantic, pose):
        rgb_np = np.asarray(rgb)
        rgb = jnp.asarray(rgb_np, jnp.float32)
        if np.issubdtype(rgb_np.dtype, np.integer):
            rgb = rgb / 255.0
        depth = jnp.asarray(np.asarray(depth).astype(np.uint16))
        semantic = jnp.asarray(np.asarray(semantic).astype(np.int32))
        pose = jnp.asarray(np.asarray(pose), jnp.float32)
        return rgb, depth, semantic, pose

    def process_frame(self, rgb, depth, semantic, pose) -> dict[str, Any]:
        """Ingest one frame (reference processFrame,
        src/SurfelMapping.cpp:115-251).  ``pose`` is the ground-truth (or
        ICP-refined) camera-to-world 4x4.  Returns per-frame stats."""
        sw = self.stopwatch
        rgb, depth, semantic, pose = self._to_device(rgb, depth, semantic, pose)

        if not self.ref_frame_set:
            with sw.time("Preprocess"):
                self.last_depth = _preprocess_only(
                    depth, semantic, self.cam, self.params
                )
            self.last_pose = pose
            self.ref_frame_set = True
            self.history_poses.append(np.asarray(pose))
            self.tick += 1
            self.last_stats = {"count": self.count, "first_frame": True}
            return self.last_stats

        time = jnp.float32(self.tick)
        if self.tick == 0:
            # only reachable after reset()
            with sw.time("Initialize"):
                while True:
                    smap, filtered, dropped = _init_step(
                        self.smap, depth, rgb, semantic, pose,
                        self.last_depth, self.last_pose, time,
                        self.cam, self.params,
                    )
                    if int(dropped) == 0:
                        break
                    self._maybe_grow(int(dropped))
            self.smap = smap
            self._refresh_counts()
            stats = {"count": self._cached_count, "initialized": True}
        else:
            # pre-grow so overflow is impossible until the next periodic sync
            max_new = (self.cam.height * self.cam.width) // 2 + 1
            frames_ahead = self.sync_every - self._since_sync + 1
            self._maybe_grow_cached(self._cached_count + frames_ahead * max_new)
            with sw.time("Run"):
                smap, filtered, dropped, stats_dev = _fusion_step(
                    self.smap, depth, rgb, semantic, pose,
                    self.last_depth, self.last_pose, time,
                    self.cam, self.params,
                )
            self.smap = smap
            self._pending_dropped.append(dropped)
            self._since_sync += 1
            if self._since_sync >= self.sync_every:
                self._refresh_counts()
            stats = {k: v for k, v in stats_dev.items()}

        self.last_depth = filtered
        self.last_pose = pose
        self.history_poses.append(np.asarray(pose))
        self.tick += 1
        self.last_stats = stats
        return stats

    def clean_points(self, depth, semantic, pose) -> None:
        """Backward ghost-removal replay (reference cleanPoints)."""
        _, depth, semantic, pose = self._to_device(
            np.zeros((1, 1, 3)), depth, semantic, pose
        )
        with self.stopwatch.time("Clean Points"):
            self.smap = _clean_step(
                self.smap, depth, semantic, pose, self.cam, self.params
            )

    # -- persistence --------------------------------------------------------

    def save_map(self, path: str, start_id: int = 0, end_id: int = 0) -> None:
        save_map(self.smap, path, start_id, end_id)

    def load_map(self, path: str) -> tuple[int, int]:
        smap, start_id, end_id = load_map(path)
        cap = self.map_config.capacity
        while smap.capacity > cap * self.map_config.watermark:
            cap = int(cap * self.map_config.growth_factor)
        self.smap = resize_map(smap, cap)
        self.tick = end_id + 1
        self.ref_frame_set = True
        return start_id, end_id
