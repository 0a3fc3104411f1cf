#!/usr/bin/env python
"""Mapping entry point (reference build_map.cpp parity, headless).

Usage:
    python build_map.py <dataset_dir> [--out MAP.bin] [--frames N]
        [--sub-level L] [--clean] [--icp] [--synthetic N]

Consumes a KITTI-layout dataset (or --synthetic frames of the procedural
scene), runs the fusion pipeline frame by frame, optionally replays the
backward cleanPoints pass (build_map.cpp:306-326), and writes the map in the
reference's binary format with a timestamped default name
(build_map.cpp:234-255).
"""

from __future__ import annotations

import argparse
import sys
import time as _time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset", nargs="?", help="KITTI-layout dataset directory")
    ap.add_argument("--out", default=None, help="output map path")
    ap.add_argument("--frames", type=int, default=None, help="max frames")
    ap.add_argument("--sub-level", type=int, default=0)
    ap.add_argument("--clean", action="store_true", help="run backward cleanPoints")
    ap.add_argument("--icp", action="store_true", help="refine poses with frame-to-model ICP")
    ap.add_argument("--ba", action="store_true",
                    help="refine poses with windowed bundle adjustment "
                         "(odometry source = ICP when --icp is also given, "
                         "else the input poses)")
    ap.add_argument("--ba-window", type=int, default=5)
    ap.add_argument("--ba-odo-weight", type=float, default=1e4)
    ap.add_argument("--pose-noise", type=float, default=0.0, metavar="SIGMA",
                    help="perturb input poses with random-walk noise (m/frame) "
                         "— drives the ICP/BA parity experiments")
    ap.add_argument("--synthetic", type=int, default=0, metavar="N",
                    help="use N procedural frames instead of a dataset")
    ap.add_argument("--synthetic-cam", choices=["kitti", "small"],
                    default="kitti",
                    help="synthetic camera: full KITTI resolution or a "
                         "256x128 smoke-test camera (CI / quick runs)")
    ap.add_argument("--capacity", type=int, default=1 << 22)
    ap.add_argument("--devices", type=int, default=1, metavar="D",
                    help="run the block-sharded engine over a D-device mesh "
                         "(parallel/sharded.py); if fewer real devices exist, "
                         "a D-device virtual CPU mesh is forced (must be set "
                         "before JAX initialises).  ICP/BA with --devices "
                         "gather the map per frame (a host sync each)")
    ap.add_argument("--sync-every", type=int, default=8,
                    help="sharded-engine window length between host syncs")
    ap.add_argument("--gui", action="store_true",
                    help="interactive 4-panel viewer (keys: space pause, "
                         ". step, s save, c clean, r reset, v novel view, "
                         "m cycle model view, q quit); headless "
                         "environments write PNG snapshots instead")
    ap.add_argument("--gui-snapshots", default=None, metavar="DIR",
                    help="force snapshot mode into DIR")
    ap.add_argument("--gui-render-every", type=int, default=10,
                    help="refresh the model panel every N frames")
    ap.add_argument("--fuse-thresh", type=float, default=None,
                    help="override surfel fuse distance threshold factor")
    ap.add_argument("--profile", action="store_true", help="print stage timings")
    args = ap.parse_args(argv)

    if args.devices > 1:
        # the mesh needs D devices; when the host has fewer real chips,
        # re-exec under a D-device virtual CPU mesh (the forcing flag only
        # works BEFORE jax initialises, so a child process is the safe path)
        import os
        import subprocess
        import sys as _sys

        import jax as _jax

        if len(_jax.devices()) < args.devices:
            if os.environ.get("_SURFEL_FORCED_MESH"):
                ap.error(
                    f"--devices {args.devices} but only "
                    f"{len(_jax.devices())} devices even under the forced "
                    "CPU mesh"
                )
            env = dict(os.environ)
            env["_SURFEL_FORCED_MESH"] = "1"
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={args.devices}"
            ).strip()
            return subprocess.call(
                [_sys.executable, os.path.abspath(__file__)]
                + list(argv if argv is not None else _sys.argv[1:]),
                env=env,
            )

    from surfelmapping_tpu.config import MapConfig, PipelineParams
    from surfelmapping_tpu.pipeline import SurfelMapper

    params = PipelineParams()
    if args.fuse_thresh is not None:
        import dataclasses
        params = dataclasses.replace(params, fuse_thresh_factor=args.fuse_thresh)

    if args.synthetic:
        from surfelmapping_tpu.io.synthetic import (
            SyntheticScene,
            kitti_cam,
            tiny_cam,
        )

        if args.synthetic_cam == "small":
            # >100 px wide so the 80 px stereo border still ingests columns
            cam = tiny_cam(256, 128)
        else:
            cam = kitti_cam()
        scene = SyntheticScene(cam)
        n = args.synthetic

        def frames():
            for i in range(n):
                rgb, d, s, T = scene.frame(i)
                yield i, rgb, d, s, T
    else:
        if not args.dataset:
            ap.error("dataset directory or --synthetic N required")
        from surfelmapping_tpu.io.kitti import KittiReader

        reader = KittiReader(args.dataset, sub_level=args.sub_level)
        cam = reader.cam

        def frames():
            while True:
                f = reader.get_next()
                if f is None:
                    return
                if args.frames and f.frame_id >= args.frames:
                    return
                yield f.frame_id, f.rgb, f.depth, f.semantic, f.pose

    sharded = args.devices > 1
    if sharded:
        import jax
        import numpy as _np
        from jax.sharding import Mesh

        from surfelmapping_tpu.parallel.sharded import AXIS, ShardedMapper

        mesh = Mesh(_np.array(jax.devices()[: args.devices]), (AXIS,))
        mapper = ShardedMapper(
            mesh, cam, params, capacity=args.capacity,
            sync_every=args.sync_every,
        )
        current_map = mapper.smap  # method: gathers shards (a host sync)
    else:
        mapper = SurfelMapper(cam, params, MapConfig(capacity=args.capacity))
        current_map = lambda: mapper.smap  # noqa: E731

    pp = ba = None
    refine_pose = None
    if args.icp or args.ba:
        import functools

        import jax
        import jax.numpy as jnp

        from surfelmapping_tpu.icp import preprocess_for_icp, refine_pose

        pp = jax.jit(functools.partial(preprocess_for_icp, cam=cam, params=params))
    if args.ba:
        from surfelmapping_tpu.ba import WindowedBA

        ba = WindowedBA(cam, params, window=args.ba_window,
                        odo_weight=args.ba_odo_weight)

    noise_rng = np.random.default_rng(0) if args.pose_noise else None
    drift = np.eye(4, dtype=np.float32)

    gui = None
    if args.gui or args.gui_snapshots:
        from surfelmapping_tpu.gui import MappingGUI

        gui = MappingGUI(cam, snapshot_dir=args.gui_snapshots,
                         snapshot_every=args.gui_render_every)

    t0 = _time.perf_counter()
    n_frames = 0
    history = []
    gt_poses = []
    novel_count = 0
    for fid, rgb, depth, sem, pose in frames():
        if gui is not None and gui.quit:
            break
        gt_poses.append(np.asarray(pose, np.float32))
        if noise_rng is not None:
            dT = np.eye(4, dtype=np.float32)
            dT[:3, 3] = noise_rng.normal(0, args.pose_noise, 3)
            drift = drift @ dT
            pose = np.asarray(pose, np.float32) @ drift
        if pp is not None and mapper.count > 0:
            # ICP/BA run on the gathered in-frustum active table: every
            # iteration costs O(in-view surfels), not O(capacity).
            # The table is gathered for the NEWEST frame's frustum; the BA
            # window's older frames reuse it, which assumes consecutive
            # frusta overlap heavily (true at KITTI frame spacing — ~1 m
            # steps against a 30 m view depth; widen --ba-window with care)
            depth_m = pp(
                jnp.asarray(np.asarray(depth).astype(np.uint16)),
                jnp.asarray(np.asarray(sem).astype(np.int32)),
            )
            at = mapper.active_table(pose)
            if args.icp:
                refined, _ = refine_pose(
                    at, depth_m, jnp.asarray(pose, jnp.float32), cam, params
                )
                pose = np.asarray(refined)
            if ba is not None:
                ba.push(depth_m, pose, at=at, time=float(fid))
                pose = ba.refine(at, time=float(fid))
        stats = mapper.process_frame(rgb, depth, sem, pose)
        history.append((fid, rgb, depth, sem, pose))
        n_frames += 1
        if n_frames % 20 == 0:
            fps = n_frames / (_time.perf_counter() - t0)
            print(f"frame {fid}: surfels={mapper.count} fps={fps:.2f}", flush=True)
        if gui is not None:
            import jax.numpy as _jnp

            render = map_render = None
            if n_frames % args.gui_render_every == 0 and mapper.count > 0:
                from surfelmapping_tpu.ops.splat import render_view

                m = current_map()
                if getattr(gui, "show_local", False) and not sharded:
                    # 'l' key: the frame's unfused local surfel cloud
                    # (reference getLocalSurfelModel inspection view)
                    lm = mapper.local_model(rgb, depth, sem, pose)
                    render = render_view(
                        lm, _jnp.asarray(pose, _jnp.float32), cam
                    )
                else:
                    render = render_view(
                        m, _jnp.asarray(pose, _jnp.float32), cam
                    )
                map_render = render_view(
                    m, _jnp.asarray(gui.map_view_pose(pose), _jnp.float32),
                    cam,
                )
            if sharded:
                status_count = stats.get("count", "?")
                cap_used, cap_total = int(mapper._tails.sum()), mapper.capacity
            else:
                status_count = mapper.last_stats.get("count", "?")
                cap_used, cap_total = mapper._cached_tail, mapper._smap.capacity
            gui.update(
                rgb, np.asarray(depth, np.float32) / 1000.0, sem, render,
                status=f"frame {fid}  surfels={status_count}",
                pose=np.asarray(pose, np.float32),
                map_render=map_render,
                capacity_used=cap_used, capacity_total=cap_total,
            )
            if gui.want_save:
                gui.want_save = False
                path = _time.strftime("surfel_map_%m_%d_%H:%M:%S.bin")
                mapper.save_map(path, history[0][0], fid)
                print(f"saved {path}")
            if gui.want_clean:
                gui.want_clean = False
                if sharded:
                    print("clean: unsupported live on the sharded engine "
                          "(run --clean for an end-of-run pass)")
                else:
                    for cfid, crgb, cd, cs, cp in reversed(history):
                        mapper.clean_points(cd, cs, cp)
                    print(f"cleaned: surfels={mapper.count}")
            if gui.want_reset:
                gui.want_reset = False
                mapper.reset()
                print("map reset")
            if gui.want_novel:
                gui.want_novel = False
                from surfelmapping_tpu.views import (
                    acquire_images,
                    random_novel_views,
                )

                views = random_novel_views(
                    [np.asarray(h[4], np.float32) for h in history], 1,
                    seed=novel_count,
                )
                acquire_images(current_map(), views, "output/novel", cam,
                               start_id=novel_count)
                novel_count += 1
                print(f"acquired novel view {novel_count}")
            gui.wait_if_paused()

    if args.icp or args.ba or args.pose_noise:
        est = np.stack([np.asarray(h[4], np.float32)[:3, 3] for h in history])
        gt = np.stack([p[:3, 3] for p in gt_poses])
        ate = float(np.sqrt(np.mean(np.sum((est - gt) ** 2, axis=1))))
        print(f"ATE (rmse vs input gt): {ate:.4f} m")

    if args.clean:
        print("running backward cleanPoints pass ...")
        if sharded:
            # clean is a backward BATCH pass over the finished map — gather
            # the shards once and replay it on the single-chip engine
            import jax.numpy as _jnp

            from surfelmapping_tpu.surfels import resize_map

            single = SurfelMapper(cam, params, MapConfig(capacity=args.capacity))
            gathered = mapper.smap()
            cap = single.map_config.rounded_capacity(
                max(int(gathered.count), args.capacity)
            )
            single.smap = resize_map(gathered, cap)
            single._cached_count = single._cached_tail = int(gathered.count)
            for fid, rgb, depth, sem, pose in reversed(history):
                single.clean_points(depth, sem, pose)
            print(f"after clean: surfels={single.count}")
            mapper = single
            sharded = False
        else:
            for fid, rgb, depth, sem, pose in reversed(history):
                mapper.clean_points(depth, sem, pose)
            print(f"after clean: surfels={mapper.count}")

    out = args.out or _time.strftime("surfel_map_%m_%d_%H:%M:%S.bin")
    start_id = history[0][0] if history else 0
    end_id = history[-1][0] if history else 0
    mapper.save_map(out, start_id, end_id)
    dt = _time.perf_counter() - t0
    print(
        f"{out} saved: {mapper.count} surfels from {n_frames} frames "
        f"({n_frames/dt:.2f} fps)"
    )
    if args.profile and hasattr(mapper, "stopwatch"):
        print(mapper.stopwatch.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
