"""Localize the mid-run throughput dip (BENCH_r04: 13.1 -> 8.7 -> 13.3 fps
across 20-frame bands) with fine-grained windows + host-event attribution.

Runs the exact bench configuration but times 5-frame windows and reports,
per window: fps, the mapper's event counters (window replays, budget
growths, compacts, capacity growths), the peak true active-block count and
the live/tail cursors — so a slow band is ATTRIBUTED, not guessed at.

Run on the TPU: python tools/probe_dip.py [--frames 100] [--win 5]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "all")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--win", type=int, default=5)
    ap.add_argument("--sync-every", type=int, default=32)
    args = ap.parse_args()

    from surfelmapping_tpu.config import MapConfig, PipelineParams
    from surfelmapping_tpu.io.synthetic import SyntheticScene, kitti_cam
    from surfelmapping_tpu.pipeline import SurfelMapper

    cam = kitti_cam()
    mapper = SurfelMapper(
        cam, PipelineParams(),
        MapConfig(capacity=1 << 24, active_blocks=512,
                  freeze_active_budget=True),
        sync_every=args.sync_every,
    )
    scene = SyntheticScene(cam, step=0.8)
    frames = [mapper.stage_frame(*scene.frame(i)) for i in range(args.frames)]

    for i in range(4):
        mapper.process_frame(*frames[i])
        mapper._refresh_counts()
    mapper._compact_now()

    rows = []
    prev_events = dict(mapper.events)
    for lo in range(4, args.frames, args.win):
        hi = min(lo + args.win, args.frames)
        _ = mapper.count
        t0 = time.perf_counter()
        for i in range(lo, hi):
            mapper.process_frame(*frames[i])
        live = mapper.count  # drains; any replay lands inside this timer,
        # exactly as in the bench
        dt = time.perf_counter() - t0
        ev = dict(mapper.events)
        delta = {k: ev[k] - prev_events[k] for k in ev if k != "peak_active"}
        row = {
            "frames": [lo, hi],
            "fps": round((hi - lo) / dt, 2),
            "live": int(live),
            "tail": mapper._cached_tail,
            "peak_active": ev["peak_active"],
            **{k: v for k, v in delta.items() if v},
        }
        prev_events = ev
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"windows": rows}))


if __name__ == "__main__":
    main()
