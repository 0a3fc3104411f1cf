"""Attribute the ~76 ms/frame driver overhead (probe_driver_gap A-B).

Times every host-side phase of SurfelMapper.process_frame across 32 frames
(two sync windows) with perf_counter around each statement group, plus the
periodic-sync internals (repair reads, count reduce, compaction).  Python-
side blocking time exposes dispatch/read stalls on the tunnel backend.
"""
import sys
import time
from collections import defaultdict

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import surfelmapping_tpu.pipeline as P
from surfelmapping_tpu.config import MapConfig, PipelineParams
from surfelmapping_tpu.io.synthetic import SyntheticScene, kitti_cam

acc = defaultdict(float)
cnt = defaultdict(int)


class T:
    def __init__(self, key):
        self.key = key

    def __enter__(self):
        self.t0 = time.perf_counter()

    def __exit__(self, *a):
        acc[self.key] += time.perf_counter() - self.t0
        cnt[self.key] += 1


def main():
    cam = kitti_cam()
    params = PipelineParams()
    cfg = MapConfig(capacity=1 << 23)
    mapper = P.SurfelMapper(cam, params, cfg, sync_every=16)
    scene = SyntheticScene(cam, step=0.8)
    N = 70
    frames = [mapper.stage_frame(*scene.frame(i)) for i in range(N)]
    for i in range(30):
        mapper.process_frame(*frames[i])
    _ = mapper.count

    # wrap internals
    orig_refresh = mapper._refresh_counts
    orig_repair = mapper._repair_overflow
    orig_compact = mapper._compact_now

    def refresh():
        with T("sync:_refresh_counts"):
            orig_refresh()

    def repair():
        with T("sync:_repair_overflow"):
            orig_repair()

    def compactn():
        with T("sync:_compact_now"):
            orig_compact()

    mapper._refresh_counts = refresh
    mapper._repair_overflow = repair
    mapper._compact_now = compactn

    t_all0 = time.perf_counter()
    for i in range(30, 62):
        rgb, depth, sem, pose = frames[i]
        with T("frame_total"):
            with T("to_device"):
                rgb2, depth2, sem2, pose2 = mapper._to_device(rgb, depth, sem, pose)
            with T("pre_grow"):
                max_new = (cam.height * cam.width) // 2 + 1
                ahead = mapper.sync_every - mapper._since_sync + 1
                mapper._maybe_grow_cached(mapper._cached_tail + ahead * max_new)
            eff = mapper._effective_active_blocks
            with T("time_scalar"):
                tscal = jnp.float32(mapper.tick)
            with T("step_dispatch"):
                smap, filtered, dropped, stats_dev = P._fusion_step(
                    mapper._smap, depth2, rgb2, sem2, pose2,
                    mapper.last_depth, mapper.last_pose, tscal,
                    cam, params, eff, cfg.block_size,
                )
            with T("bookkeeping"):
                mapper._smap = smap
                n_act = stats_dev.pop("active_blocks")
                if not mapper._window:
                    mapper._chk = None  # drop the snapshot: test its cost
                    mapper._chk = smap
                mapper._window.append(
                    ((depth2, rgb2, sem2, pose2, mapper.last_depth,
                      mapper.last_pose, tscal), eff)
                )
                mapper._pending_dropped.append(dropped)
                mapper._pending_active.append(n_act)
                mapper._since_sync += 1
            if mapper._since_sync >= mapper.sync_every:
                with T("periodic_sync"):
                    mapper._refresh_counts()
            mapper.last_depth = filtered
            mapper.last_pose = pose2
            mapper.tick += 1
    with T("final_count"):
        _ = mapper.count
    total = time.perf_counter() - t_all0

    nfr = 32
    print(f"total {total/nfr*1e3:8.2f} ms/frame over {nfr} frames")
    for k in sorted(acc, key=lambda k: -acc[k]):
        print(f"  {k:24s} {acc[k]/nfr*1e3:8.2f} ms/frame  (n={cnt[k]})")


if __name__ == "__main__":
    main()
