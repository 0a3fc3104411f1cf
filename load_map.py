#!/usr/bin/env python
"""Simulation entry point (reference load_map.cpp parity, headless).

Loads a saved surfel map and renders novel-view image/semantic pairs for
simulator data generation:

    python load_map.py MAP.bin --calib <dataset_dir>|--synthetic \
        [--mode random|s|paired] [--num N] [--out DIR] [--seed S]

Modes (load_map.cpp:114-287):
  paired:   render at the ground-truth poses of the mapped id range;
  random:   +-2 m x, +-1 m z, +-15 deg yaw perturbations of random gt frames;
  s:        "S"-shaped sinusoidal sweep along the trajectory (drops the first
            4 frames when acquiring, load_map.cpp:223-229);
  overview: lifted chase-camera fly-through of the whole trajectory (the
            reference's overview sweep, load_map.cpp:254-287).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("map", help="binary surfel map (reference format)")
    ap.add_argument("--calib", default=None, help="dataset dir for intrinsics+poses")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--mode", choices=["paired", "random", "s", "overview"],
                    default="random")
    ap.add_argument("--num", type=int, default=20)
    ap.add_argument("--out", default="output/novel")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--footprint", type=int, default=5)
    args = ap.parse_args(argv)

    from surfelmapping_tpu.surfels import load_map as load_map_file
    from surfelmapping_tpu.views import (
        acquire_images,
        overview_views,
        random_novel_views,
        s_shaped_views,
    )

    smap, start_id, end_id = load_map_file(args.map)
    print(f"loaded {int(smap.count)} surfels, frames [{start_id}, {end_id}]")

    if args.synthetic or not args.calib:
        from surfelmapping_tpu.io.synthetic import SyntheticScene, kitti_cam

        cam = kitti_cam()
        scene = SyntheticScene(cam)
        base_views = [scene.pose(i) for i in range(start_id, max(end_id + 1, start_id + 2))]
    else:
        from surfelmapping_tpu.io.kitti import KittiReader

        reader = KittiReader(args.calib)
        cam = reader.cam
        base_views = [reader.poses[i] for i in range(start_id, end_id + 1)]

    if args.mode == "paired":
        views = [np.asarray(v, np.float32) for v in base_views]
        out_dir = args.out.replace("novel", "paired")
        first_id = start_id
    elif args.mode == "random":
        views = random_novel_views(base_views, args.num, seed=args.seed)
        out_dir = args.out
        first_id = 0
    elif args.mode == "s":
        views = s_shaped_views(base_views, period=float(args.num) * 3)[4:]
        out_dir = args.out
        first_id = start_id + 4
    else:
        views = overview_views(base_views)
        out_dir = args.out.replace("novel", "overview")
        first_id = start_id

    print(f"rendering {len(views)} views -> {out_dir}")
    acquire_images(smap, views, out_dir, cam, start_id=first_id,
                   footprint=args.footprint)
    print("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
