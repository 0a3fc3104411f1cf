"""Scaling-efficiency benchmark of the block-sharded fusion step.

Runs the SAME synthetic sequence (fixed total work) through
make_sharded_step on meshes of 1/2/4/8 virtual CPU devices and reports
wall-clock per frame.  On one shared host the devices time-slice the same
cores, so PERFECT scaling appears as flat wall time as D grows — any rise
is the true cost of the per-frame collectives + sharding overhead
(efficiency(D) = t(1) / t(D)).  On real multi-chip hardware the same step
shards the compute too, so this measures exactly the overhead term of the
scaling story.

Usage: python tools/bench_scaling.py [--out SCALING_r04.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from surfelmapping_tpu.config import PipelineParams
from surfelmapping_tpu.io.synthetic import SyntheticScene, tiny_cam
from surfelmapping_tpu.parallel.sharded import (
    AXIS,
    empty_sharded,
    make_sharded_step,
    state_sharding,
)


def run(n_devices: int, frames: int, cam, params, cap: int, block: int):
    mesh = Mesh(np.asarray(jax.devices()[:n_devices]), (AXIS,))
    state = jax.device_put(empty_sharded(cap, n_devices), state_sharding(mesh))
    step = make_sharded_step(
        mesh, cam, params, n_devices,
        active_blocks=max(4, 64 // n_devices), block_size=block,
    )
    scene = SyntheticScene(cam, step=0.4)
    staged = []
    for i in range(frames + 1):
        rgb, depth, sem, pose = scene.frame(i)
        staged.append((
            jnp.asarray(depth),
            jnp.asarray(rgb, jnp.float32) / 255.0,
            jnp.asarray(sem.astype(np.int32)),
            jnp.asarray(pose),
        ))

    last_depth = jnp.zeros((cam.height, cam.width), jnp.float32)
    last_pose = staged[0][3]
    warm = 3
    t0 = None
    stats = None
    for i in range(1, frames + 1):
        depth, rgb, sem, pose = staged[i]
        state, last_depth, stats = step(
            state, depth, rgb, sem, pose, last_depth, last_pose,
            jnp.float32(i),
        )
        last_pose = pose
        if i == warm:
            jax.block_until_ready(state.px)
            t0 = time.perf_counter()
    jax.block_until_ready(state.px)
    dt = (time.perf_counter() - t0) / (frames - warm)
    return dt, int(stats["count"]), int(stats["dropped"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING_r04.json")
    ap.add_argument("--frames", type=int, default=16)
    args = ap.parse_args()

    cam = tiny_cam(256, 128)
    params = PipelineParams(stereo_border=0.0)
    cap = 1 << 17
    block = 512

    results = []
    t1 = None
    for d in (1, 2, 4, 8):
        dt, count, dropped = run(d, args.frames, cam, params, cap, block)
        if t1 is None:
            t1 = dt
        results.append({
            "devices": d,
            "ms_per_frame": round(dt * 1e3, 2),
            "efficiency_vs_1dev": round(t1 / dt, 3),
            "surfels": count,
            "dropped": dropped,
        })
        print(results[-1], flush=True)

    out = {
        "note": (
            "shared-host virtual devices: fixed total work, so flat wall "
            "time = perfect scaling; efficiency = t(1)/t(D) bounds the "
            "collective + sharding overhead FROM BELOW — the dense "
            "preprocess/movings stencils run replicated (free on real "
            "multi-chip hardware, but on D virtual devices sharing these 2 "
            "cores the replicated work is recomputed D times and dominates "
            "the apparent inefficiency; row-sharding the stencils was "
            "tried and rejected: GSPMD inserts a halo collective per "
            "shifted tap, 3-10x slower)"
        ),
        "resolution": f"{cam.width}x{cam.height}",
        "frames": args.frames,
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
