"""Stage attribution by ABLATION inside the real execution regime.

Two measurement traps on the deferred-dispatch tunnel backend (both hit in
round 3 — keep this tool honest):
  * ``block_until_ready`` is a no-op lie: only a host TRANSFER (float())
    forces execution, so un-chained repeat dispatches may never run;
  * separately-jitted per-stage timings lose XLA's cross-stage fusion and
    pay compile inside any timer warmed without a real transfer.

Two attribution modes, both timing DATA-DEPENDENT chained iterations (a
carry scalar feeds back into the input) with exactly one float() sync:

  * ``--mode prefix`` (legacy): cumulative prefixes of the step.  The
    round-4 lesson: truncating the step CHANGES XLA's fusion/overlap, so
    successive differences can go NEGATIVE (preprocess 46 ms -> upto
    movings 9.9 ms) and per-stage shares are not trustworthy.
  * ``--mode loo`` (leave-one-out, the default): time the FULL step, then
    the full step with ONE stage replaced by a shape-preserving identity.
    full - loo(stage) is the stage's true marginal cost inside the real
    overlap regime — what you would actually save by making it free.

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
    # compact so the probed state matches the r4 snapshots (tail == live;
    # the round-5 pressure-gated policy no longer compacts mid-run)
    mapper._refresh_counts()
    if mapper._cached_tail != mapper._cached_count:
        mapper._compact_now()
    return cam, params, cfg, mapper, frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--stages", default=None,
                    help="comma-separated subset (compiles are slow through "
                         "the tunnel — run in chunks)")
    ap.add_argument("--mode", choices=["loo", "prefix"], default="loo")
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

    def force(*objs):
        """Sum every array leaf so NOTHING upstream is dead-code-eliminated
        (round-3 trap: returning one scalar let XLA drop 10 of the 11 column
        writes and the probe under-reported the frame by ~35 ms)."""
        tot = jnp.float32(0)
        for o in objs:
            for leaf in jax.tree.leaves(o):
                tot = tot + jnp.sum(leaf).astype(jnp.float32)
        return tot

    def upto(stage: str):
        def fn(c, smap, depth_raw, rgb, sem, pose, last_depth, last_pose, time):
            # chain: the carry scalar contaminates the input so iteration
            # k+1 cannot execute before k (defeats lazy-dispatch elision)
            depth_raw = depth_raw + (c * 0).astype(depth_raw.dtype)
            filtered = preprocess_frame(depth_raw, sem, cam, params)
            if stage == "preprocess":
                return force(filtered)
            T_c2l = compose(invert_se3(last_pose), pose)
            depth_m = remove_movings(filtered, sem, last_depth, T_c2l, cam, params)
            if stage == "movings":
                return force(filtered, depth_m)
            T_inv = invert_se3(pose)
            blk, n_active = A.plan_active_blocks(smap, T_inv, cam, params, AB, B)
            if stage == "plan":
                return force(filtered, depth_m, blk, n_active)
            at = A.gather_active(smap, blk, B)
            if stage == "gather":
                return force(filtered, depth_m, at)
            at, removed = A.conflict_active(
                at, depth_m, sem, T_inv, cam, params,
                min_depth=params.near_clip, max_depth=params.far_clip,
                fuse_thresh=params.fuse_thresh_factor, is_clean=False,
            )
            if stage == "conflict":
                return force(filtered, depth_m, at, removed)
            idx_img = A.index_active(at, T_inv, time, cam, params)
            if stage == "index":
                return force(filtered, depth_m, at, removed, idx_img)
            if stage == "assoc_cand":
                # the dense per-pixel candidate half of association only
                from surfelmapping_tpu.ops.frame_surfels import (
                    association_candidates,
                )

                cand = association_candidates(depth_m, rgb, sem, cam, params)
                cb = [A.checkerboard_flat(x) for x in jax.tree.leaves(cand)]
                return force(filtered, at, removed, idx_img, cb)
            assoc = A.associate_active(
                depth_m, rgb, sem, idx_img, at, pose, T_inv, time, cam, params
            )
            if stage == "associate":
                return force(filtered, at, removed, assoc)
            # production tail: one combined merge/append scatter
            smap2, dropped = A.fuse_append_map(smap, at, assoc, B)
            return force(filtered, removed, smap2, dropped)

        return jax.jit(fn)

    def leave_out(skip: str | None):
        """The FULL step with ``skip`` replaced by a shape-preserving
        identity; downstream stages still run on well-formed (if different)
        data, so the measured cost keeps the real fusion/overlap regime.

        Every stand-in is DATA-DEPENDENT on purpose: a constant replacement
        (zeros idx_img, constant assoc marks) lets XLA constant-fold the
        downstream consumers away and the 'marginal' silently includes them
        (first draft of this probe: marginals summed to 3.3x the full step,
        monotone in stage position — the classic DCE tell)."""

        def fn(c, smap, depth_raw, rgb, sem, pose, last_depth, last_pose, time):
            depth_raw = depth_raw + (c * 0).astype(depth_raw.dtype)
            if skip == "preprocess":
                # cheap stand-in with the same dtype/shape as the filtered
                # image (the stencil chain is what's being ablated)
                filtered = depth_raw.astype(jnp.float32) * (1.0 / 1000.0)
            else:
                filtered = preprocess_frame(depth_raw, sem, cam, params)
            if skip == "movings":
                # +tiny: a DISTINCT tensor, so downstream consumers of
                # depth_m cannot CSE with consumers of filtered
                depth_m = filtered + jnp.float32(1e-30)
            else:
                T_c2l = compose(invert_se3(last_pose), pose)
                depth_m = remove_movings(
                    filtered, sem, last_depth, T_c2l, cam, params
                )
            T_inv = invert_se3(pose)
            data_zero = (depth_raw[0, 0] * 0).astype(jnp.int32)
            if skip == "plan":
                blk = jnp.arange(AB, dtype=jnp.int32) + data_zero
                n_active = jnp.int32(AB) + data_zero
            else:
                blk, n_active = A.plan_active_blocks(
                    smap, T_inv, cam, params, AB, B
                )
            at = A.gather_active(smap, blk, B)  # downstream needs a table
            if skip != "conflict":
                at, removed = A.conflict_active(
                    at, depth_m, sem, T_inv, cam, params,
                    min_depth=params.near_clip, max_depth=params.far_clip,
                    fuse_thresh=params.fuse_thresh_factor, is_clean=False,
                )
            else:
                removed = data_zero
            if skip == "index":
                idx = jnp.mod(depth_m.astype(jnp.int32), at.size)
                idx_img = jnp.where(depth_m > 0, idx, -1)
            else:
                idx_img = A.index_active(at, T_inv, time, cam, params)
            if skip == "associate":
                v = A.checkerboard_flat(depth_m)
                mark = jnp.where(v > 1e30, 0, -10).astype(jnp.int32)
                assoc = A.AssocFlat(
                    x=v, y=v, z=v, conf=v, colorsem=v, init_t=v,
                    last_t=v, nx=v, ny=v, nz=v, radius=v, mark=mark,
                )
            else:
                assoc = A.associate_active(
                    depth_m, rgb, sem, idx_img, at, pose, T_inv, time, cam,
                    params,
                )
            if skip == "tail":
                return force(filtered, removed, assoc, idx_img)
            smap2, dropped = A.fuse_append_map(smap, at, assoc, B)
            return force(filtered, removed, smap2, dropped)

        return jax.jit(fn)

    argv = (smap, depth_raw, rgb, sem, pose, last_depth, last_pose, t_now)

    def timed(f):
        c = f(jnp.float32(0), *argv)
        _ = float(c)  # forces compile + one real execution
        t0 = time.perf_counter()
        c = jnp.float32(0)
        for _ in range(args.iters):
            c = f(c * 1e-30, *argv)
        _ = float(c)  # one transfer forces the whole chain
        return (time.perf_counter() - t0) / args.iters * 1e3

    if args.mode == "prefix":
        stages = [
            "preprocess", "movings", "plan", "gather", "conflict",
            "index", "assoc_cand", "associate", "full",
        ]
        if args.stages:
            stages = [s for s in args.stages.split(",") if s]
        results = {}
        prev = 0.0
        for st in stages:
            dt = timed(upto(st))
            results[st] = dt
            print(f"upto {st:12s} {dt:8.2f} ms  (+{dt - prev:7.2f})",
                  flush=True)
            prev = dt
        print(json.dumps({"cumulative_ms": results, "eff_blocks": AB}))
        return

    stages = ["preprocess", "movings", "plan", "conflict", "index",
              "associate", "tail"]
    if args.stages:
        stages = [s for s in args.stages.split(",") if s]
    full_ms = timed(leave_out(None))
    print(f"full step        {full_ms:8.2f} ms", flush=True)
    results = {"full": full_ms}
    marginal = {}
    for st in stages:
        dt = timed(leave_out(st))
        results[f"without_{st}"] = dt
        marginal[st] = full_ms - dt
        print(f"without {st:10s} {dt:8.2f} ms  (marginal {full_ms - dt:7.2f})",
              flush=True)
    print(json.dumps({
        "mode": "leave_one_out", "ms": results, "marginal_ms": marginal,
        "eff_blocks": AB,
    }))


if __name__ == "__main__":
    main()
