"""ICP pose-refinement: perturb a ground-truth pose and verify refinement
recovers it against a fused map (the capability BASELINE.json adds on top of
the reference, which only consumes gt poses)."""

import numpy as np
import jax.numpy as jnp

from surfelmapping_tpu.config import MapConfig, PipelineParams
from surfelmapping_tpu.icp import preprocess_for_icp, refine_pose
from surfelmapping_tpu.io.synthetic import SyntheticScene, tiny_cam
from surfelmapping_tpu.pipeline import SurfelMapper

# Three fronto-parallel faces at different (x, z) so depth (z), height (y),
# pitch and yaw are all constrained; lateral x stays scene-unconstrained
# (corridor gauge freedom) — the depth filter's support test removes grazing
# surfaces exactly like the reference's depth_filter.frag, so axis-aligned
# side faces never make it into the map.
BOXES = (((-4.0, 0.6, 11.0), (1.0, 1.0, 1.5)), ((0.5, 0.7, 18.0), (1.2, 0.9, 1.0)))


def _build(n_frames):
    cam = tiny_cam()
    # merging enabled so revisited surfels gain confidence and survive the
    # conflict pass; smooth_radius=1 keeps the reference's 13x13 near-flat
    # smoothing kernel (a view-dependent depth bias at grazing angles) out of
    # the geometry so the test isolates the ICP solver itself
    m = SurfelMapper(
        cam,
        PipelineParams(fuse_thresh_factor=0.05, smooth_radius=1),
        MapConfig(capacity=1 << 15),
    )
    scene = SyntheticScene(
        cam, step=0.4, car_center=(4.5, 0.8, 13.0), extra_boxes=BOXES
    )
    for i in range(n_frames):
        rgb, d, s, T = scene.frame(i)
        m.process_frame(rgb, d, s, T)
    assert m.count > 0
    return cam, m, scene


def test_icp_recovers_perturbed_pose():
    cam, m, scene = _build(4)
    rgb, d, s, T_gt = scene.frame(4)
    # perturb: 10 cm forward, 5 cm lateral, 0.7 deg yaw
    yaw = np.deg2rad(0.7)
    Ry = np.array(
        [
            [np.cos(yaw), 0, np.sin(yaw), 0],
            [0, 1, 0, 0],
            [-np.sin(yaw), 0, np.cos(yaw), 0],
            [0, 0, 0, 1],
        ],
        np.float32,
    )
    T0 = T_gt @ Ry
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
    assert int(diag["inliers"]) > 60
    # depth/height/yaw are fully constrained by the three faces + ground; the
    # residual error is the scene-unconstrained lateral (x) component
    err_z = abs(refined[2, 3] - T_gt[2, 3])
    err_y = abs(refined[1, 3] - T_gt[1, 3])
    dR = refined[:3, :3].T @ T_gt[:3, :3]
    yaw_err = abs(np.arctan2(dR[0, 2], dR[0, 0]))
    assert err_z < 0.02, f"ICP left z error {err_z:.4f} m"
    assert err_y < 0.02, f"ICP left y error {err_y:.4f} m"
    assert yaw_err < np.deg2rad(0.3), f"ICP left yaw error {np.rad2deg(yaw_err):.3f} deg"
    err1 = np.linalg.norm(refined[:3, 3] - T_gt[:3, 3])
    assert err1 < 0.07, f"ICP residual translation error {err1:.4f} m"


def test_icp_identity_stays_put():
    cam, m, scene = _build(3)
    rgb, d, s, T_gt = scene.frame(2)
    depth_m = preprocess_for_icp(jnp.asarray(d), jnp.asarray(s.astype("int32")),
                                 cam, m.params)
    refined, diag = refine_pose(
        m.smap, depth_m, jnp.asarray(T_gt, jnp.float32), cam, m.params,
        iters=4,
    )
    drift = np.linalg.norm(np.asarray(refined)[:3, 3] - T_gt[:3, 3])
    assert drift < 0.01, f"ICP drifted {drift:.4f} m from a correct pose"
