"""Split the frame cost into RAW jitted-step cost vs host-driver overhead.

ablate_stages measures the full chained step at ~84 ms/frame while bench.py
pays ~160-175 ms/frame on the same map sizes.  This probe builds the same
30-frame state, then times, from identical conditions:

  A. the real driver loop (mapper.process_frame, pre-staged frames) —
     bench.py's regime;
  B. a bare python loop over _fusion_step with the EVOLVING map state and
     per-frame staged inputs (no window bookkeeping, no stats dict, no
     pre-grow arithmetic, no host reads);
  C. like B but with the map state FIXED (feeding the same smap every call,
     discarding the new one) — ablate_stages' regime.

A-B = host-driver overhead.  B-C = cost of evolving 370 MB of map state
per frame (allocation churn / copy scheduling on the tunnel backend).
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import surfelmapping_tpu.pipeline as P
from surfelmapping_tpu.config import MapConfig, PipelineParams
from surfelmapping_tpu.io.synthetic import SyntheticScene, kitti_cam


def main():
    cam = kitti_cam()
    params = PipelineParams()
    cfg = MapConfig(capacity=1 << 23)
    mapper = P.SurfelMapper(cam, params, cfg, sync_every=16)
    scene = SyntheticScene(cam, step=0.8)
    N = 80
    frames = [mapper.stage_frame(*scene.frame(i)) for i in range(N)]
    for i in range(30):
        mapper.process_frame(*frames[i])
    _ = mapper.count
    eff = mapper._effective_active_blocks
    B = cfg.block_size
    print(f"state: tail={mapper._cached_tail} eff={eff}", flush=True)

    # --- A: real driver loop -------------------------------------------------
    t0 = time.perf_counter()
    for i in range(30, 50):
        mapper.process_frame(*frames[i])
    _ = mapper.count
    a = (time.perf_counter() - t0) / 20 * 1e3
    print(f"A driver loop      {a:8.2f} ms/frame", flush=True)

    # --- B: bare step loop, evolving state ----------------------------------
    smap = mapper._smap
    last_depth, last_pose = mapper.last_depth, mapper.last_pose
    # warm the executable for this exact shape set
    rgb50, depth50, sem50, pose50 = frames[50]
    s2, f2, d2, st2 = P._fusion_step(
        smap, depth50, rgb50, sem50, pose50, last_depth, last_pose,
        jnp.float32(50), cam, params, eff, B,
    )
    _ = float(st2["count"])
    t0 = time.perf_counter()
    s, ld, lp = smap, last_depth, last_pose
    for i in range(51, 71):
        depth, rgb, sem, pose = frames[i][1], frames[i][0], frames[i][2], frames[i][3]
        s, ld2, dropped, stats = P._fusion_step(
            s, depth, rgb, sem, pose, ld, lp, jnp.float32(i),
            cam, params, eff, B,
        )
        ld, lp = ld2, pose
    _ = float(stats["count"])
    b = (time.perf_counter() - t0) / 20 * 1e3
    print(f"B bare evolving    {b:8.2f} ms/frame", flush=True)

    # --- C: bare step loop, fixed state, chained via scalar ------------------
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for i in range(20):
        depth, rgb, sem, pose = frames[51][1], frames[51][0], frames[51][2], frames[51][3]
        # _fusion_step donates its map input — feed it a fresh copy each
        # iteration (the copy cost is part of this variant's overhead)
        s2, ld2, dropped, stats = P._fusion_step(
            jax.tree.map(jnp.copy, smap),
            depth + (c * 0).astype(depth.dtype), rgb, sem, pose,
            last_depth, last_pose, jnp.float32(51),
            cam, params, eff, B,
        )
        c = stats["count"].astype(jnp.float32) * 1e-30
    _ = float(c)
    cms = (time.perf_counter() - t0) / 20 * 1e3
    print(f"C bare fixed       {cms:8.2f} ms/frame", flush=True)
    print(f"driver overhead (A-B): {a - b:.2f} ms; "
          f"state-evolution cost (B-C): {b - cms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
