"""Headline benchmark: KITTI-resolution surfel fusion frames/s on one chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The reference publishes no numbers (BASELINE.md) — only the qualitative
"real time" claim for its desktop-GPU pipeline on KITTI-odometry frames
(~1226x370).  We therefore benchmark the same operating point (full KITTI
resolution, 1/2-sparse ingest, growing map) and report frames/s; the
vs_baseline denominator is 10 fps, a conservative reading of "real time"
mapping for the reference's 14-pass glFinish-synchronous pipeline.
"""

from __future__ import annotations

import json
import time as _time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from surfelmapping_tpu.config import MapConfig, PipelineParams
    from surfelmapping_tpu.io.synthetic import SyntheticScene, kitti_cam
    from surfelmapping_tpu.pipeline import SurfelMapper

    cam = kitti_cam()
    params = PipelineParams()
    mapper = SurfelMapper(cam, params, MapConfig(capacity=1 << 22))
    scene = SyntheticScene(cam, step=0.8)

    warmup = 3
    measured = 20
    frames = [scene.frame(i) for i in range(warmup + measured)]

    # warmup (also triggers compilation)
    for i in range(warmup):
        rgb, d, s, T = frames[i]
        mapper.process_frame(rgb, d, s, T)
    jax.block_until_ready(mapper.smap.pos)

    t0 = _time.perf_counter()
    for i in range(warmup, warmup + measured):
        rgb, d, s, T = frames[i]
        mapper.process_frame(rgb, d, s, T)
    jax.block_until_ready(mapper.smap.pos)
    dt = _time.perf_counter() - t0

    fps = measured / dt
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
                    "frames": measured,
                    "final_surfels": mapper.count,
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
