"""Record the parity numbers BASELINE.md defines (VERDICT r3 missing #3).

Runs on the current backend (TPU in production, CPU in CI):
  1. fuse a synthetic KITTI-resolution sequence with merging enabled;
  2. render the map at held mapping poses -> PSNR-on-hits + hit fraction
     (the reference's render->GAN loop quality anchor, load_map.cpp:132-247);
  3. novel-view render latency at the final map (render_view, culled);
  4. ATE experiments at --pose-noise: raw noisy poses vs ICP vs ICP+BA vs
     the gt baseline (the north-star tracking claim).

Writes one JSON (default PARITY_r04.json).
Usage: python tools/record_parity.py [--frames 40] [--small] [--out F]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
if "--small" in sys.argv:
    # CI mode must not steal (and contend for) the real chip
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np


def build(frames, cam, params, scene, poses=None, icp=False, ba=False,
          ba_kwargs=None):
    import jax
    import jax.numpy as jnp

    from surfelmapping_tpu.config import MapConfig
    from surfelmapping_tpu.pipeline import SurfelMapper

    mapper = SurfelMapper(cam, params, MapConfig(capacity=1 << 21), sync_every=8)
    pp = refine = None
    bao = None
    if icp or ba:
        import functools

        from surfelmapping_tpu.icp import preprocess_for_icp, refine_pose

        pp = jax.jit(functools.partial(preprocess_for_icp, cam=cam, params=params))
        refine = refine_pose
    if ba:
        from surfelmapping_tpu.ba import WindowedBA

        bao = WindowedBA(cam, params, **(ba_kwargs or {"window": 5}))

    est = []
    for i in range(frames):
        rgb, d, s, T = scene.frame(i)
        pose = poses[i] if poses is not None else np.asarray(T, np.float32)
        if pp is not None and mapper.count > 0:
            depth_m = pp(
                jnp.asarray(np.asarray(d).astype(np.uint16)),
                jnp.asarray(np.asarray(s).astype(np.int32)),
            )
            at = mapper.active_table(pose)
            if icp:
                refined, _ = refine_pose(
                    at, depth_m, jnp.asarray(pose, jnp.float32), cam, params
                )
                pose = np.asarray(refined)
            if bao is not None:
                bao.push(depth_m, pose, at=at, time=float(i))
                pose = bao.refine(at, time=float(i))
        mapper.process_frame(rgb, d, s, pose)
        est.append(np.asarray(pose, np.float32))
    return mapper, est


def main():
    import jax
    import jax.numpy as jnp

    from surfelmapping_tpu.config import PipelineParams
    from surfelmapping_tpu.io.synthetic import SyntheticScene, kitti_cam, tiny_cam
    from surfelmapping_tpu.metrics import absolute_trajectory_error, psnr
    from surfelmapping_tpu.ops.splat import render_view

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PARITY_r04.json")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--noise", type=float, default=0.02)
    ap.add_argument("--small", action="store_true",
                    help="small camera (CI on CPU)")
    args = ap.parse_args()

    import dataclasses

    cam = tiny_cam(256, 128) if args.small else kitti_cam()
    params = PipelineParams(fuse_thresh_factor=0.05)
    if args.small:
        params = dataclasses.replace(params, stereo_border=0.0)
    # a corridor of boxes along the trajectory: the bare ground+walls scene
    # leaves forward translation unconstrained and ICP free-drifts along z
    boxes = tuple(
        (((-4.0 if i % 2 else 4.5), 0.6, 6.0 + 5.0 * i), (1.0, 1.0, 1.2))
        for i in range(12)
    )
    scene = SyntheticScene(cam, step=0.5, extra_boxes=boxes)

    # ---- 1+2: map + PSNR at mapping poses --------------------------------
    mapper, _ = build(args.frames, cam, params, scene)
    smap = mapper.smap
    count = int(mapper.count)

    psnrs, hit_fracs = [], []
    render_ms = []
    for i in (args.frames // 4, args.frames // 2, args.frames - 2):
        rgb, d, s, T = scene.frame(i)
        t0 = time.perf_counter()
        out = render_view(smap, jnp.asarray(T, jnp.float32), cam, footprint=5)
        rendered = np.asarray(out["rgb"])  # forces execution
        render_ms.append((time.perf_counter() - t0) * 1e3)
        hits = np.asarray(out["semantic"]) > 0
        frame = np.asarray(rgb, np.float64) / 255.0
        psnrs.append(psnr(rendered, frame, hits))
        hit_fracs.append(float(hits.mean()))
    # steady-state render latency (first call pays the compile)
    rgb, d, s, T = scene.frame(args.frames // 2)
    t0 = time.perf_counter()
    out = render_view(smap, jnp.asarray(T, jnp.float32), cam, footprint=5)
    _ = np.asarray(out["rgb"])
    render_steady_ms = (time.perf_counter() - t0) * 1e3

    # ---- 4: ATE experiments ---------------------------------------------
    gt = [np.asarray(scene.frame(i)[3], np.float32) for i in range(args.frames)]
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
        return absolute_trajectory_error(np.stack(poses), gt_arr)

    ates = {"noisy_raw": ate(noisy)}
    _, est_icp = build(args.frames, cam, params, scene, poses=noisy, icp=True)
    ates["noisy_icp"] = ate(est_icp)
    _, est_ba = build(
        args.frames, cam, params, scene, poses=noisy, icp=True, ba=True
    )
    ates["noisy_icp_ba"] = ate(est_ba)

    out_doc = {
        "backend": jax.default_backend(),
        "resolution": f"{cam.width}x{cam.height}",
        "frames": args.frames,
        "surfel_count": count,
        "psnr_on_hits_db": [round(p, 2) for p in psnrs],
        "hit_fraction": [round(h, 3) for h in hit_fracs],
        "novel_view_render_ms": {
            "first_calls": [round(m, 1) for m in render_ms],
            "steady": round(render_steady_ms, 1),
        },
        "pose_noise_sigma_m_per_frame": args.noise,
        "ate_m": ates,
    }
    with open(args.out, "w") as f:
        json.dump(out_doc, f, indent=1)
    print(json.dumps(out_doc))


if __name__ == "__main__":
    main()
