"""Transferable multi-chip efficiency evidence (VERDICT r4 weakness #8).

The 8-virtual-CPU-mesh scaling number is confounded (replicated stencils
recompute on 2 shared cores), so this tool builds the projection from REAL
single-chip measurements instead:

  1. t_dense   — the replicated per-device work (preprocess + movings +
     plan): every device pays it in full (GSPMD halo exchange makes sharding
     the 13x13 stencil chain 3-10x SLOWER — measured round 4, see memory
     notes), measured as the prefix step on the real chip;
  2. t_body(B) — the shardable active-table work measured by timing the FULL
     step at active budgets B in {512, 256, 128, 64}: a D-device map shard
     owns ~512/D of the frame's active blocks (round-robin dealing measured
     balance 1.07, WORKPROP_r04), so t_body(512/D) is each device's share;
  3. t_coll(D) — the sharded step's ONLY cross-device traffic is 3
     image-sized collectives (2 pmin + 1 pmax over i32[H*W]): bytes =
     3 * H*W * 4 * 2(D-1)/D per device (ring all-reduce), at a conservative
     45 GB/s/link ICI + 5 us/hop latency.

Projected step(D) = t_dense + t_body(512/D) + t_coll(D); efficiency(D) =
step(1) / (D * step(D)) ... strong scaling of a FIXED frame ingest.  Note
the north star's >80% target concerns weak map scaling: the map grows with
D while the per-frame ingest stays one camera, so the model also reports
throughput_speedup(D) = step(1)/step(D), the honest strong-scaling number.

Run on the TPU: python tools/model_scaling.py [--out SCALING_r05.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING_r05.json")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--frames", type=int, default=30)
    args = ap.parse_args()

    from surfelmapping_tpu.config import MapConfig, PipelineParams
    from surfelmapping_tpu.io.synthetic import SyntheticScene, kitti_cam
    from surfelmapping_tpu.ops import active as A
    from surfelmapping_tpu.ops.preprocess import preprocess_frame, remove_movings
    from surfelmapping_tpu.ops.transforms import compose, invert_se3
    from surfelmapping_tpu.pipeline import SurfelMapper

    cam = kitti_cam()
    params = PipelineParams()
    cfg = MapConfig(capacity=1 << 23)
    mapper = SurfelMapper(cam, params, cfg, sync_every=16)
    scene = SyntheticScene(cam, step=0.8)
    frames = [mapper.stage_frame(*scene.frame(i))
              for i in range(args.frames + 2)]
    for i in range(args.frames):
        mapper.process_frame(*frames[i])
    _ = mapper.count
    smap = mapper._smap
    B = cfg.block_size
    rgb, depth_raw, sem, pose = frames[args.frames]
    last_depth, last_pose = mapper.last_depth, mapper.last_pose
    t_now = jnp.float32(args.frames)

    def force(*objs):
        tot = jnp.float32(0)
        for o in objs:
            for leaf in jax.tree.leaves(o):
                tot = tot + jnp.sum(leaf).astype(jnp.float32)
        return tot

    def step_at(budget: int, dense_only: bool = False):
        def fn(c, smap, depth_raw, rgb, sem, pose, last_depth, last_pose, time):
            depth_raw = depth_raw + (c * 0).astype(depth_raw.dtype)
            filtered = preprocess_frame(depth_raw, sem, cam, params)
            T_c2l = compose(invert_se3(last_pose), pose)
            depth_m = remove_movings(filtered, sem, last_depth, T_c2l, cam, params)
            T_inv = invert_se3(pose)
            blk, n_active = A.plan_active_blocks(
                smap, T_inv, cam, params, budget, B
            )
            if dense_only:
                return force(filtered, depth_m, blk, n_active)
            at = A.gather_active(smap, blk, B)
            at, removed = A.conflict_active(
                at, depth_m, sem, T_inv, cam, params,
                min_depth=params.near_clip, max_depth=params.far_clip,
                fuse_thresh=params.fuse_thresh_factor, is_clean=False,
            )
            idx_img = A.index_active(at, T_inv, time, cam, params)
            assoc = A.associate_active(
                depth_m, rgb, sem, idx_img, at, pose, T_inv, time, cam, params
            )
            smap2, dropped = A.fuse_append_map(smap, at, assoc, B)
            return force(filtered, removed, smap2, dropped)

        return jax.jit(fn)

    argv = (smap, depth_raw, rgb, sem, pose, last_depth, last_pose, t_now)

    def timed(f):
        c = f(jnp.float32(0), *argv)
        _ = float(c)
        t0 = time.perf_counter()
        c = jnp.float32(0)
        for _ in range(args.iters):
            c = f(c * 1e-30, *argv)
        _ = float(c)
        return (time.perf_counter() - t0) / args.iters * 1e3

    t_dense = timed(step_at(512, dense_only=True))
    print(f"dense (replicated) part: {t_dense:.2f} ms", flush=True)
    budgets = [512, 256, 128, 64]
    t_full = {}
    for b in budgets:
        t_full[b] = timed(step_at(b))
        print(f"full step @ {b:4d} blocks: {t_full[b]:.2f} ms", flush=True)

    H, W = cam.height, cam.width
    img_bytes = H * W * 4
    coll_bytes_total = 3 * img_bytes  # 2 pmin + 1 pmax (Hc*Wc==H*W/2 x2 ~ 1)
    ici_gbps = 45.0  # conservative v5e-class per-link ring bandwidth
    hop_lat_us = 5.0

    model = []
    t1 = t_full[512]
    for D in (1, 2, 4, 8):
        per_dev_blocks = max(512 // D, 64)
        body = t_full[per_dev_blocks] - t_dense
        if D == 1:
            coll = 0.0
        else:
            ring = 2 * (D - 1) / D
            coll = (
                coll_bytes_total * ring / (ici_gbps * 1e9) * 1e3
                + 3 * 2 * (D - 1) * hop_lat_us * 1e-3
            )
        step = t_dense + body + coll
        model.append({
            "devices": D,
            "per_device_blocks": per_dev_blocks,
            "projected_step_ms": round(step, 2),
            "collective_ms": round(coll, 4),
            "throughput_speedup": round(t1 / step, 3),
            "parallel_efficiency": round(t1 / (D * step), 3),
        })
        print(json.dumps(model[-1]), flush=True)

    doc = {
        "note": (
            "projection from REAL single-chip measurements: t_dense is the "
            "replicated preprocess/movings/plan prefix, t_body(B) from "
            "timing the full step at per-device active budgets, collectives "
            "modelled analytically (3 image all-reduces/frame = "
            f"{coll_bytes_total/1e6:.1f} MB at {ici_gbps} GB/s ring). "
            "Speedup saturates at t_dense: the dense stencil front is the "
            "replicated fraction (GSPMD halo sharding measured 3-10x "
            "slower, so replicating it is the right design); map CAPACITY "
            "scales linearly with D throughout (each device holds 1/D of "
            "the map), which is the north star's actual scaling axis."
        ),
        "backend": jax.default_backend(),
        "dense_ms": round(t_dense, 2),
        "full_ms_at_budget": {str(k): round(v, 2) for k, v in t_full.items()},
        "collective_bytes_per_frame": coll_bytes_total,
        "model": model,
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
