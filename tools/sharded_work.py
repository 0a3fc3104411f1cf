"""Measure per-device work proportionality of the sharded engine.

Round-3 verdict asked for evidence that each device's per-frame work is
proportional to its share of the IN-FRUSTUM surfels, not to its capacity.
This runs a 20-frame synthetic sequence on an 8-virtual-device CPU mesh via
the ShardedMapper driver and records, per frame:

  * per-device active-block count (the working-set size every table stage
    is linear in — stats["active_per_dev"]);
  * per-device live surfels (capacity-side denominator);
  * the global active fraction.

Work proportionality holds when max/mean active blocks across devices stays
near 1 (balanced) while active blocks per device tracks the in-frustum
share (drops when the camera turns away from the map).

Usage: python tools/sharded_work.py [--out WORKPROP_r04.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import jax
import numpy as np
from jax.sharding import Mesh

from surfelmapping_tpu.config import PipelineParams
from surfelmapping_tpu.io.synthetic import SyntheticScene, tiny_cam
from surfelmapping_tpu.parallel.sharded import AXIS, ShardedMapper


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="WORKPROP_r04.json")
    ap.add_argument("--frames", type=int, default=20)
    args = ap.parse_args()

    n_dev = 8
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), (AXIS,))
    cam = tiny_cam(256, 128)
    params = PipelineParams(stereo_border=0.0)
    # sync_every=1 so each frame's stats are immediately readable
    mapper = ShardedMapper(
        mesh, cam, params, capacity=1 << 17, active_blocks=16,
        block_size=256, sync_every=1,
    )
    scene = SyntheticScene(cam, step=0.6)
    rows = []
    for i in range(args.frames):
        rgb, depth, sem, pose = scene.frame(i)
        stats = mapper.process_frame(rgb, depth, sem, pose)
        if "first_frame" in stats:
            continue
        act = np.asarray(stats["active_per_dev"], int).tolist()
        live = np.asarray(stats["live_per_dev"], int).tolist()
        mx, mn = max(act), max(min(act), 1)
        rows.append({
            "frame": i,
            "active_blocks_per_dev": act,
            "live_per_dev": live,
            "balance_max_over_mean": round(
                mx / max(sum(act) / len(act), 1e-9), 3
            ),
            "global_count": int(stats["count"]),
            "removed": int(stats["removed"]),
        })
        print(rows[-1], flush=True)

    balances = [r["balance_max_over_mean"] for r in rows[2:]]
    out = {
        "note": (
            "active_blocks_per_dev is the per-device working-set size every "
            "table stage is linear in; balance_max_over_mean ~ 1 means each "
            "device's work is ~1/D of the in-frustum total (round-robin "
            "dealing keeps shard streams temporally coherent)"
        ),
        "devices": n_dev,
        "frames": rows,
        "mean_balance": round(float(np.mean(balances)), 3),
        "worst_balance": round(float(np.max(balances)), 3),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}: mean balance {out['mean_balance']}")


if __name__ == "__main__":
    main()
