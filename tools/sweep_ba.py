"""Sweep BA hyperparameters on the parity noise experiment (CPU, small cam)
until ICP+BA beats ICP alone (VERDICT r4 weakness #7).

For each config: build the noisy-pose map with ICP only and with ICP+BA,
report ATE rmse.  Run: python tools/sweep_ba.py [--frames 40]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, ".")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import dataclasses

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--noise", type=float, default=0.02)
    args = ap.parse_args()

    from surfelmapping_tpu.config import PipelineParams
    from surfelmapping_tpu.io.synthetic import SyntheticScene, tiny_cam
    from surfelmapping_tpu.metrics import absolute_trajectory_error
    from tools.record_parity import build

    cam = tiny_cam(256, 128)
    params = dataclasses.replace(
        PipelineParams(fuse_thresh_factor=0.05), stereo_border=0.0
    )
    boxes = tuple(
        (((-4.0 if i % 2 else 4.5), 0.6, 6.0 + 5.0 * i), (1.0, 1.0, 1.2))
        for i in range(12)
    )

    def scene():
        return SyntheticScene(cam, step=0.5, extra_boxes=boxes)

    gt = [np.asarray(scene().frame(i)[3], np.float32)
          for i in range(args.frames)]
    rng = np.random.default_rng(0)
    drift = np.eye(4, dtype=np.float32)
    noisy = []
    for T in gt:
        dT = np.eye(4, dtype=np.float32)
        dT[:3, 3] = rng.normal(0, args.noise, 3)
        drift = drift @ dT
        noisy.append(T @ drift)
    gt_arr = np.stack(gt)

    def ate(poses):
        return absolute_trajectory_error(np.stack(poses), gt_arr)["rmse"]

    _, est_icp = build(args.frames, cam, params, scene(), poses=noisy,
                       icp=True)
    icp_rmse = ate(est_icp)
    print(f"icp only: rmse={icp_rmse:.4f}", flush=True)

    sweep = [
        {"window": 5, "odo_weight": 1e4},   # current default
        {"window": 5, "odo_weight": 1e3},
        {"window": 5, "odo_weight": 3e2},
        {"window": 5, "odo_weight": 1e2},
        {"window": 5, "odo_weight": 3e4},
        {"window": 3, "odo_weight": 1e4},
        {"window": 8, "odo_weight": 1e4},
        {"window": 5, "odo_weight": 1e4, "prior_decay": 0.0},
        {"window": 5, "odo_weight": 1e4, "prior_decay": 0.7},
        {"window": 5, "odo_weight": 1e3, "iters": 6},
    ]
    results = []
    for kw in sweep:
        _, est = build(args.frames, cam, params, scene(), poses=noisy,
                       icp=True, ba=True, ba_kwargs=kw)
        r = ate(est)
        results.append({**kw, "rmse": r, "vs_icp": r / icp_rmse})
        print(json.dumps(results[-1]), flush=True)
    results.sort(key=lambda x: x["rmse"])
    print(json.dumps({"icp_rmse": icp_rmse, "best": results[0],
                      "all": results}))


if __name__ == "__main__":
    main()
