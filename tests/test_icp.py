"""ICP pose-refinement: perturb a ground-truth pose and verify refinement
recovers it against a fused map (the capability BASELINE.json adds on top of
the reference, which only consumes gt poses)."""

import numpy as np
import jax.numpy as jnp

from surfelmapping_tpu.config import MapConfig, PipelineParams
from surfelmapping_tpu.icp import preprocess_for_icp, refine_pose
from surfelmapping_tpu.io.synthetic import SyntheticScene, tiny_cam
from surfelmapping_tpu.pipeline import SurfelMapper


def test_icp_recovers_perturbed_pose():
    cam = tiny_cam()
    # merging enabled so revisited surfels gain confidence and survive the
    # conflict pass, giving ICP a well-constrained multi-plane model;
    # smooth_radius=1 keeps the reference's 13x13 near-flat smoothing kernel
    # (a view-dependent depth bias at grazing angles) out of the geometry
    # so the test isolates the ICP solver itself
    m = SurfelMapper(
        cam,
        PipelineParams(fuse_thresh_factor=0.05, smooth_radius=1),
        MapConfig(capacity=1 << 15),
    )
    scene = SyntheticScene(cam, step=0.4, car_center=(4.5, 0.8, 13.0))
    for i in range(4):
        rgb, d, s, T = scene.frame(i)
        m.process_frame(rgb, d, s, T)
    assert m.count > 0

    rgb, d, s, T_gt = scene.frame(4)
    # perturb: 10 cm forward + 5 cm lateral offset
    T0 = T_gt.copy()
    T0[0, 3] += 0.05
    T0[2, 3] += 0.10

    depth_m = preprocess_for_icp(jnp.asarray(d), jnp.asarray(s.astype("int32")),
                                 cam, m.params)
    refined, diag = refine_pose(
        m.smap,
        depth_m,
        jnp.asarray(T0, jnp.float32),
        cam,
        m.params,
        iters=8,
    )
    refined = np.asarray(refined)
    err0 = np.linalg.norm(T0[:3, 3] - T_gt[:3, 3])
    err1 = np.linalg.norm(refined[:3, 3] - T_gt[:3, 3])
    assert int(diag["inliers"]) > 60
    # the z perturbation is fully constrained by the car face; the residual
    # error is the scene-unconstrained lateral component
    err_z = abs(refined[2, 3] - T_gt[2, 3])
    assert err_z < 0.02, f"ICP left z error {err_z:.4f} m"
    assert err1 < 0.07, f"ICP did not improve: {err0:.4f} -> {err1:.4f}"


def test_icp_identity_stays_put():
    cam = tiny_cam()
    m = SurfelMapper(
        cam,
        PipelineParams(fuse_thresh_factor=0.05, smooth_radius=1),
        MapConfig(capacity=1 << 15),
    )
    scene = SyntheticScene(cam, step=0.4, car_center=(4.5, 0.8, 13.0))
    for i in range(3):
        rgb, d, s, T = scene.frame(i)
        m.process_frame(rgb, d, s, T)
    rgb, d, s, T_gt = scene.frame(2)
    depth_m = preprocess_for_icp(jnp.asarray(d), jnp.asarray(s.astype("int32")),
                                 cam, m.params)
    refined, diag = refine_pose(
        m.smap, depth_m, jnp.asarray(T_gt, jnp.float32), cam, m.params,
        iters=4,
    )
    drift = np.linalg.norm(np.asarray(refined)[:3, 3] - T_gt[:3, 3])
    assert drift < 0.05, f"ICP drifted {drift:.4f} m from a correct pose"
