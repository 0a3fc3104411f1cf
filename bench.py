"""Headline benchmark: KITTI-resolution surfel fusion frames/s on one chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The reference publishes no numbers (BASELINE.md) — only the qualitative
"real time" claim for its desktop-GPU pipeline on KITTI-odometry frames
(~1226x370).  We therefore benchmark the same operating point (full KITTI
resolution, 1/2-sparse ingest, growing map) and report frames/s; the
vs_baseline denominator is 10 fps, a conservative reading of "real time"
mapping for the reference's 14-pass glFinish-synchronous pipeline.

The headline number is measured at a >=4M-surfel map; an fps-vs-map-size
curve is reported in detail (per-frame cost must be O(in-view surfels), not
O(map) — ops/active.py).
"""

from __future__ import annotations

import json
import os
import time as _time

# persistent executable cache: budget-bucket re-jits must not pay a fresh
# XLA compile on every bench invocation
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "all")


def _measure_window(mapper, frames, lo, hi) -> tuple[float, int]:
    """fps over frames[lo:hi] with a hard host sync on each end."""
    _ = mapper.count  # drain + sync
    t0 = _time.perf_counter()
    for i in range(lo, hi):
        rgb, d, s, T = frames[i]
        mapper.process_frame(rgb, d, s, T)
    surfels = mapper.count  # forces the chain
    dt = _time.perf_counter() - t0
    return (hi - lo) / dt, surfels


def main() -> None:
    import jax

    from surfelmapping_tpu.config import MapConfig, PipelineParams
    from surfelmapping_tpu.io.synthetic import SyntheticScene, kitti_cam
    from surfelmapping_tpu.pipeline import SurfelMapper

    cam = kitti_cam()
    params = PipelineParams()
    # capacity and active budget pre-sized so no growth re-jit lands inside a
    # timed window (this backend pays a large one-time cost per executable)
    # active budget pre-sized to the sequence's steady working set so no
    # pow2 bucket re-jit (a fresh XLA compile through the tunnel) lands
    # inside a timed window
    mapper = SurfelMapper(
        cam,
        params,
        MapConfig(capacity=1 << 24, active_blocks=512,
                  freeze_active_budget=True),
        sync_every=32,
    )
    scene = SyntheticScene(cam, step=0.8)

    n_total = 100
    # pre-stage frames on device: the engine benchmark measures fusion, not
    # host IO (in deployment the native prefetcher overlaps staging with
    # compute; this dev environment reaches the chip through a slow tunnel
    # that cannot overlap anything)
    frames = [mapper.stage_frame(*scene.frame(i)) for i in range(n_total)]

    # warmup: compile every step shape + the sync path + the deferred
    # compaction shape (it fires periodically once tombstones accumulate);
    # the interleaved syncs let the active budget settle on its bucket so
    # no re-jit lands inside a timed window
    for i in range(4):
        rgb, d, s, T = frames[i]
        mapper.process_frame(rgb, d, s, T)
        mapper._refresh_counts()
    mapper._compact_now()

    curve = []
    fps = 0.0
    surfels = 0
    for lo, hi in ((10, 30), (40, 60), (80, 100)):
        # advance untimed to the window start
        for i in range(max(4, curve and curve[-1]["frame_hi"] or 4), lo):
            rgb, d, s, T = frames[i]
            mapper.process_frame(rgb, d, s, T)
        fps, surfels = _measure_window(mapper, frames, lo, hi)
        curve.append(
            {"frame_hi": hi, "surfels": int(surfels), "fps": round(fps, 3)}
        )

    baseline_fps = 10.0
    print(
        json.dumps(
            {
                "metric": "kitti_fusion_fps_per_chip",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 3),
                "detail": {
                    "resolution": f"{cam.width}x{cam.height}",
                    "final_surfels": int(surfels),
                    "fps_vs_map_size": curve,
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
