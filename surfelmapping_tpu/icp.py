"""Frame-to-model ICP pose refinement (point-to-plane, Gauss-Newton).

The reference takes ground-truth poses and explicitly performs no tracking
(src/SurfelMapping.h:29 "if provided, we don't attempt to perform tracking";
the ElasticFusion prediction passes are commented out,
src/IndexMap.cpp:234-473).  This module supplies that missing capability the
TPU-native way:

  * per iteration, the model is projectively associated to the frame through
    the same scatter-argmin index map as fusion (no extra renderer);
  * per-pixel point-to-plane residuals r = n_w . (T v_c - p_w) with Huber
    weighting build the 6x6 normal equations as masked sums — a shape that
    psum-reduces across a device mesh unchanged (distributed ICP is the same
    kernel + one psum of (A, b, stats));
  * the 6-dof update solves on-device (6x6 Cholesky) inside a lax.fori_loop —
    the whole refinement is one jitted function.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .config import CameraIntrinsics, PipelineParams
from .ops.active import ActiveTable, index_active, table_from_map
from .ops.frame_surfels import backproject, central_normals
from .ops.transforms import compose, exp_se3, invert_se3, safe_normalize
from .surfels import SurfelMap

_EPS = 1e-12


def _normal_equations(
    v_w: jax.Array,      # f32[P,3] frame points in world frame
    p_w: jax.Array,      # f32[P,3] associated model points (world)
    n_w: jax.Array,      # f32[P,3] model normals (world)
    w: jax.Array,        # f32[P]   per-point weights (0 = invalid)
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Build A (6x6), b (6,), and the weighted residual sum-of-squares.

    Twist convention: left-multiplicative update T <- exp([v, omega]) T, so
    J = [n ; v_w x n] per point.  All outputs are plain sums over points —
    psum them across shards for distributed windowed refinement.
    """
    r = jnp.sum(n_w * (v_w - p_w), axis=-1)
    J = jnp.concatenate([n_w, jnp.cross(v_w, n_w)], axis=-1)  # [P,6]
    wr = w * r
    hp = jax.lax.Precision.HIGHEST
    A = jnp.matmul((J * w[:, None]).T, J, precision=hp)
    b = -jnp.matmul(J.T, wr, precision=hp)
    return A, b, jnp.sum(wr * r)


@functools.partial(jax.jit, static_argnames=("cam", "params", "iters"))
def refine_pose(
    smap,
    depth_metric: jax.Array,
    init_pose: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
    iters: int = 5,
    max_residual: float = 0.5,
    huber_delta: float = 0.05,
    incidence_min: float = 0.5,
):
    """Refine ``init_pose`` (camera-to-world) against the current map.

    ``smap`` may be a full SurfelMap OR an ops.active.ActiveTable (the
    gathered in-frustum working set, SurfelMapper.active_table) — the hot
    deployment passes the table so every ICP iteration costs O(in-view
    surfels), not O(capacity) (round-2 weakness: full-map index maps x 5
    iterations dominated --icp runs at multi-million-surfel maps).

    ``depth_metric`` should be :func:`preprocess_for_icp` output — support-
    FILTERED but NOT box-smoothed.  The reference's near-flat 13x13 smoothing
    displaces depth by a viewpoint-DEPENDENT amount (the bias scales with
    metres-per-pixel, i.e. with range); in the mapping feedback loop the
    smoothed-vs-smoothed pairing therefore does NOT cancel and the
    trajectory creeps ~2 cm/frame (measured 62 cm of pure-ICP drift over 30
    gt-posed frames; 19 cm with unsmoothed frames; 11 cm adding the
    incidence gate).  Raw METRICIZED depth is still wrong — the support
    filter must reject flying pixels.

    Returns (pose, diagnostics dict with rmse/inliers of the last iteration).
    """
    at = smap if isinstance(smap, ActiveTable) else table_from_map(smap)
    time = jnp.max(jnp.where(at.slot_valid, at.last_t, 0.0))
    depth = depth_metric
    vx, vy, vz = backproject(depth, cam)
    v_c = jnp.stack([vx.reshape(-1), vy.reshape(-1), vz.reshape(-1)], axis=-1)
    # frame normals (camera frame) gate correspondences exactly like the
    # fusion association's 0.5 rad angle gate (data.vert:158): pixels at depth
    # discontinuities carry garbage normals and biased geometry, and ungated
    # they drag the solution several cm along the view axis.
    ncx, ncy, ncz = central_normals(depth, cam)
    n_c = jnp.stack([ncx.reshape(-1), ncy.reshape(-1), ncz.reshape(-1)], axis=-1)
    d_flat = depth.reshape(-1)
    frame_valid = (d_flat > params.near_clip) & (d_flat < params.far_clip)
    # incidence gate: grazing-angle surfaces (distant ground) carry the
    # largest viewpoint-dependent depth bias (metres-per-pixel blow up); in
    # the mapping feedback loop those correspondences pull the trajectory in
    # a consistent direction.  Sweep on the 30-frame gt-posed loop with
    # unsmoothed frames: gate 0.0 -> 40 cm drift, 0.35 -> 19, 0.5 -> 11,
    # 0.65 -> 51 (the ground disappears and y/pitch go unconstrained).
    ray_len = jnp.linalg.norm(v_c, axis=-1)
    incidence = jnp.abs(jnp.sum(n_c * v_c, axis=-1)) / jnp.maximum(
        ray_len * jnp.linalg.norm(n_c, axis=-1), _EPS
    )
    frame_valid = frame_valid & (incidence > incidence_min)

    def body(_, carry):
        pose, _, _ = carry
        T_inv = invert_se3(pose)
        idx = index_active(at, T_inv, time, cam, params)
        fa = params.index_factor
        if fa > 1:
            # index pixel of each depth pixel's center (ceil(fa*(c+0.5))-1)
            s0 = (fa - 1) // 2
            idx = idx[s0::fa, s0::fa]
        ids = idx.reshape(-1)
        has = ids >= 0  # index_active already excludes global id 0 at source
        safe = jnp.clip(ids, 0, at.size - 1)
        # planar 1D gathers (fast path), stacked only at the small [P,3] stage
        p_w = jnp.stack([at.x[safe], at.y[safe], at.z[safe]], axis=-1)
        n_w = safe_normalize(
            jnp.stack([at.nx[safe], at.ny[safe], at.nz[safe]], axis=-1)
        )

        v_w = jnp.matmul(v_c, pose[:3, :3].T, precision=jax.lax.Precision.HIGHEST) + pose[:3, 3]
        # frame normals in world frame
        n_fw = jnp.matmul(n_c, pose[:3, :3].T, precision=jax.lax.Precision.HIGHEST)
        r = jnp.sum(n_w * (v_w - p_w), axis=-1)
        dist = jnp.linalg.norm(v_w - p_w, axis=-1)
        angle_ok = jnp.sum(n_fw * n_w, axis=-1) > 0.878  # cos(0.5 rad)
        ok = (
            frame_valid
            & has
            & angle_ok
            & (jnp.abs(r) < max_residual)
            & (dist < 4.0 * max_residual)
        )
        w = jnp.where(
            jnp.abs(r) < huber_delta, 1.0, huber_delta / jnp.maximum(jnp.abs(r), _EPS)
        )
        w = jnp.where(ok, w, 0.0)

        A, b, wss = _normal_equations(v_w, p_w, n_w, w)
        n_in = jnp.sum(ok)
        # Marquardt damping on diag(A): per-axis units (translation vs
        # rotation lever arms) stay balanced, and directions the scene does
        # not constrain (b ~ 0 there) stay put instead of exploding along
        # near-null eigenvectors.
        dA = jnp.diag(A)
        damp = 1e-2 * dA + 1e-6 * jnp.max(dA) + 1e-12
        A = A + jnp.diag(damp)
        delta = jax.scipy.linalg.solve(A, b, assume_a="pos")
        # trust region: clamp the per-iteration twist
        tnorm = jnp.linalg.norm(delta[:3])
        rnorm = jnp.linalg.norm(delta[3:])
        scale = jnp.minimum(
            1.0,
            jnp.minimum(0.3 / jnp.maximum(tnorm, 1e-12),
                        0.1 / jnp.maximum(rnorm, 1e-12)),
        )
        delta = delta * scale
        ill = ~jnp.all(jnp.isfinite(delta)) | (n_in < 64)
        delta = jnp.where(ill, jnp.zeros_like(delta), delta)

        # Step acceptance: evaluate the weighted SSE at a few step fractions
        # over the SAME correspondence set and keep the best (including "no
        # move") — a Gauss-Newton step against noisy normal equations can
        # otherwise overshoot several multiples of the mean residual.
        def sse_at(s):
            P = compose(exp_se3(delta * s), pose)
            vw = jnp.matmul(v_c, P[:3, :3].T, precision=jax.lax.Precision.HIGHEST) + P[:3, 3]
            rr = jnp.sum(n_w * (vw - p_w), axis=-1)
            return jnp.sum(w * rr * rr)

        scales = jnp.array([1.0, 0.5, 0.25, 0.0], jnp.float32)
        sses = jax.vmap(sse_at)(scales)
        best = scales[jnp.argmin(sses)]
        pose = compose(exp_se3(delta * best), pose)
        rmse = jnp.sqrt(wss / jnp.maximum(n_in.astype(jnp.float32), 1.0))
        return pose, rmse, n_in

    pose, rmse, n_in = jax.lax.fori_loop(
        0, iters, body, (init_pose, jnp.float32(0.0), jnp.int32(0))
    )
    return pose, {"rmse": rmse, "inliers": n_in}


class ICPRefiner:
    """Host-side convenience wrapper used by build_map.py --icp."""

    def __init__(self, cam: CameraIntrinsics, params: PipelineParams, iters: int = 5):
        self.cam = cam
        self.params = params
        self.iters = iters
        self.last_diag: dict = {}
        self._preprocess = jax.jit(
            functools.partial(preprocess_for_icp, cam=cam, params=params)
        )

    def refine(self, smap, depth_raw, semantic, init_pose):
        import numpy as np

        depth_m = self._preprocess(
            jnp.asarray(np.asarray(depth_raw).astype(np.uint16)),
            jnp.asarray(np.asarray(semantic).astype(np.int32)),
        )
        pose, diag = refine_pose(
            smap,
            depth_m,
            jnp.asarray(np.asarray(init_pose), jnp.float32),
            self.cam,
            self.params,
            self.iters,
        )
        self.last_diag = {k: float(v) for k, v in diag.items()}
        return np.asarray(pose)


def preprocess_for_icp(depth_raw, semantic, cam, params):
    """Metricize + both support filters, NO box smoothing (and no movings —
    it needs the last frame).  See refine_pose's docstring: the reference's
    smoothing bias is range-dependent, so smoothed frame depth does NOT
    cancel against the smoothed-ingest map and the mapping feedback loop
    drifts; unsmoothed-but-filtered frames cut the drift ~6x."""
    from .ops.preprocess import metricize_depth, support_filter

    metric = metricize_depth(depth_raw, cam, params)
    f1 = support_filter(metric, semantic, params, params.filter_diff_thresh_1)
    return support_filter(f1, semantic, params, params.filter_diff_thresh_2)
