"""Stage attribution by ABLATION inside the real execution regime.

Two measurement traps on the deferred-dispatch tunnel backend (both hit in
round 3 — keep this tool honest):
  * ``block_until_ready`` is a no-op lie: only a host TRANSFER (float())
    forces execution, so un-chained repeat dispatches may never run;
  * separately-jitted per-stage timings lose XLA's cross-stage fusion and
    pay compile inside any timer warmed without a real transfer.

So this tool times CUMULATIVE prefixes of the real fusion step, where each
iteration is DATA-DEPENDENT on the previous one (a chained scalar feeds
back into the input), with exactly one float() sync at the end — the same
discipline as the bench's sequential frame chain.  Successive differences
attribute the frame cost per stage.

Run on the TPU: python tools/ablate_stages.py [--frames 30] [--iters 16]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from surfelmapping_tpu.config import MapConfig, PipelineParams
from surfelmapping_tpu.io.synthetic import SyntheticScene, kitti_cam
from surfelmapping_tpu.ops import active as A
from surfelmapping_tpu.ops.preprocess import preprocess_frame, remove_movings
from surfelmapping_tpu.ops.transforms import compose, invert_se3
from surfelmapping_tpu.pipeline import SurfelMapper


def build_state(n_frames: int):
    cam = kitti_cam()
    params = PipelineParams()
    cfg = MapConfig(capacity=1 << 23)
    mapper = SurfelMapper(cam, params, cfg, sync_every=16)
    scene = SyntheticScene(cam, step=0.8)
    frames = [mapper.stage_frame(*scene.frame(i)) for i in range(n_frames + 2)]
    for i in range(n_frames):
        mapper.process_frame(*frames[i])
    _ = mapper.count
    return cam, params, cfg, mapper, frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--stages", default=None,
                    help="comma-separated subset (compiles are slow through "
                         "the tunnel — run in chunks)")
    args = ap.parse_args()

    cam, params, cfg, mapper, frames = build_state(args.frames)
    smap = mapper._smap
    print(
        f"state: capacity={smap.capacity} tail={int(smap.count)} "
        f"live={mapper._cached_count} eff_blocks={mapper._effective_active_blocks}",
        flush=True,
    )
    rgb, depth_raw, sem, pose = frames[args.frames]
    last_depth, last_pose = mapper.last_depth, mapper.last_pose
    t_now = jnp.float32(args.frames)
    B = cfg.block_size
    AB = mapper._effective_active_blocks

    def upto(stage: str):
        def fn(c, smap, depth_raw, rgb, sem, pose, last_depth, last_pose, time):
            # chain: the carry scalar contaminates the input so iteration
            # k+1 cannot execute before k (defeats lazy-dispatch elision)
            depth_raw = depth_raw + (c * 0).astype(depth_raw.dtype)
            filtered = preprocess_frame(depth_raw, sem, cam, params)
            if stage == "preprocess":
                return filtered.sum()
            T_c2l = compose(invert_se3(last_pose), pose)
            depth_m = remove_movings(filtered, sem, last_depth, T_c2l, cam, params)
            if stage == "movings":
                return depth_m.sum()
            T_inv = invert_se3(pose)
            blk, n_active = A.plan_active_blocks(smap, T_inv, cam, params, AB, B)
            if stage == "plan":
                return depth_m.sum() + n_active.astype(jnp.float32)
            at = A.gather_active(smap, blk, B)
            if stage == "gather":
                return depth_m.sum() + at.conf.sum()
            at, removed = A.conflict_active(
                at, depth_m, sem, T_inv, cam, params,
                min_depth=params.near_clip, max_depth=params.far_clip,
                fuse_thresh=params.fuse_thresh_factor, is_clean=False,
            )
            if stage == "conflict":
                return depth_m.sum() + at.conf.sum()
            idx_img = A.index_active(at, T_inv, time, cam, params)
            if stage == "index":
                return at.conf.sum() + idx_img.sum().astype(jnp.float32)
            assoc = A.associate_active(
                depth_m, rgb, sem, idx_img, at, pose, T_inv, time, cam, params
            )
            if stage == "associate":
                return at.conf.sum() + assoc.mark.sum().astype(jnp.float32) + assoc.x.sum()
            at = A.fuse_active(at, assoc)
            if stage == "fuse":
                return at.conf.sum() + assoc.mark.sum().astype(jnp.float32)
            smap2 = A.writeback_active(smap, at, B)
            if stage == "writeback":
                return smap2.conf.sum() + assoc.mark.sum().astype(jnp.float32)
            smap2, dropped = A.append_flat(smap2, assoc)
            return smap2.conf.sum() + dropped.astype(jnp.float32)

        return jax.jit(fn)

    stages = [
        "preprocess", "movings", "plan", "gather", "conflict",
        "index", "associate", "fuse", "writeback", "full",
    ]
    if args.stages:
        stages = [s for s in args.stages.split(",") if s]
    results = {}
    prev = 0.0
    argv = (smap, depth_raw, rgb, sem, pose, last_depth, last_pose, t_now)
    for st in stages:
        f = upto(st)
        c = f(jnp.float32(0), *argv)
        _ = float(c)  # forces compile + one real execution
        t0 = time.perf_counter()
        c = jnp.float32(0)
        for _ in range(args.iters):
            c = f(c * 1e-30, *argv)
        _ = float(c)  # one transfer forces the whole chain
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        results[st] = dt
        print(f"upto {st:12s} {dt:8.2f} ms  (+{dt - prev:7.2f})", flush=True)
        prev = dt
    print(json.dumps({"cumulative_ms": results, "eff_blocks": AB}))


if __name__ == "__main__":
    main()
