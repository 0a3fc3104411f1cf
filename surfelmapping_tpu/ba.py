"""Windowed bundle adjustment / pose-graph layer (north-star capability).

The reference performs no pose optimization at all — it ingests ground-truth
poses (src/SurfelMapping.h:29 "if provided, we don't attempt to perform
tracking").  BASELINE.json's north star asks for a sliding-window BA layer
with a *distributed Schur-complement reduction*; this module supplies it the
TPU way:

  * the window holds the K most recent frames: a pose each plus a
    stride-subsampled point/normal cloud (static shapes — one jit for the
    whole refinement);
  * two residual families per Gauss-Newton iteration:
      1. frame-to-map point-to-plane terms.  Each window frame is
         projectively associated to the surfel map through the same
         scatter-argmin index image fusion uses (ops/active.py on the
         gathered active table), vmapped over the K frames.  Their normal
         equations land in the K diagonal 6x6 blocks.
      2. odometry edges between consecutive frames: r = log(Z_k^-1 T_k^-1
         T_{k+1}) with the standard small-residual linearization
         J_{k+1} = -J_k = Adj(T_{k+1}^-1); these populate the off-diagonal
         blocks and couple the window into one block-tridiagonal system.
  * the 6K x 6K system solves on-device with a dense Cholesky (K <= ~16, so
    the solve is microscopic next to the association);
  * **marginalization is a Schur complement**: when the window slides, the
    oldest pose block is eliminated from (H, g) and the reduced system
    becomes a quadratic prior on the new head pose (classic sliding-window
    marginalization; linearization point frozen at elimination time);
  * **distribution is a psum**: every per-frame (A_k, b_k) is a plain masked
    sum over pixels, so a map-sharded deployment runs the identical kernel
    per shard and all-reduces the per-frame systems over the mesh axis by
    passing ``axis_name`` (tests/test_ba.py exercises this inside shard_map
    on a CPU mesh).  The collective moves O(K) 6x6 blocks per iteration,
    nothing per-pixel.  Single-chip entry: ``build_map.py --ba``.

Gauge: pose 0 of the window always carries a prior (the gauge fix before the
first slide, the marginalization prior after), so the system is full-rank.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .config import CameraIntrinsics, PipelineParams
from .icp import _normal_equations
from .ops.active import ActiveTable, index_active
from .ops.frame_surfels import backproject, central_normals
from .ops.transforms import (
    HIGHEST,
    adjoint_se3,
    compose,
    exp_se3,
    invert_se3,
    log_se3,
)

_EPS = 1e-12
# Map-term evidence normalization: each frame's point-to-plane normal
# equations are scaled by BA_EVIDENCE / n_inliers — without it the raw sum
# grows linearly with inlier count and the same odo_weight that balanced a
# 256x128 experiment sat ~10x too low at KITTI resolution (r5 sweeps).
# 2048 is calibrated on the KITTI-resolution parity experiment, where it
# makes ICP+BA BEAT ICP alone (rmse 0.0360 vs 0.0368, PARITY_r05);
# low-resolution toy scenes have coarser per-inlier information and prefer
# a lower effective odometry weight (tools/sweep_ba.py measures any
# config in minutes if retuning is ever needed).
BA_EVIDENCE = 2048.0


# ---------------------------------------------------------------------------
# Window state
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BAWindow:
    """Sliding window of K frames (all leaves static-shaped).

    ``v_c``/``n_c`` are stride-subsampled camera-frame points/normals
    [K, P, 3]; ``valid`` masks bad pixels.  ``odo`` holds the K-1 relative
    measurements Z_k = T_k^-1 T_{k+1} (camera-to-world convention) from the
    odometry source (GT poses, per-frame ICP, or a motion model).
    ``prior_H``/``prior_b`` is the quadratic prior on pose 0 (6x6, 6)
    linearized at ``prior_T0``.  ``n_valid`` counts occupied frames (the
    window warms up from 1)."""

    poses: jax.Array     # f32[K,4,4]
    v_c: jax.Array       # f32[K,P,3]
    n_c: jax.Array       # f32[K,P,3]
    valid: jax.Array     # bool[K,P]
    odo: jax.Array       # f32[K-1,4,4]
    prior_H: jax.Array   # f32[6,6]
    prior_b: jax.Array   # f32[6]
    prior_T0: jax.Array  # f32[4,4]
    n_valid: jax.Array   # i32


def subsample_frame(
    depth_metric: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
    stride: int,
    incidence_min: float = 0.35,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Stride-subsampled (v_c [P,3], n_c [P,3], valid [P]) from an ICP-
    preprocessed metric depth image (icp.preprocess_for_icp: support-
    filtered, unsmoothed — see refine_pose's docstring for why smoothed
    depth biases the feedback loop)."""
    vx, vy, vz = backproject(depth_metric, cam)
    nx, ny, nz = central_normals(depth_metric, cam)
    sl = (slice(stride // 2, None, stride), slice(stride // 2, None, stride))
    v = jnp.stack([vx[sl], vy[sl], vz[sl]], axis=-1).reshape(-1, 3)
    n = jnp.stack([nx[sl], ny[sl], nz[sl]], axis=-1).reshape(-1, 3)
    d = depth_metric[sl].reshape(-1)
    ok = (d > params.near_clip) & (d < params.far_clip)
    # incidence gate as in icp.refine_pose: grazing-angle correspondences
    # carry range-dependent depth bias and drag the window solution.  BA
    # defaults to a softer 0.35 than ICP's 0.5 — the odometry edges already
    # stabilize the y/pitch directions the grazing ground dominates, so BA
    # keeps more of its signal.
    ray_len = jnp.linalg.norm(v, axis=-1)
    nrm = jnp.linalg.norm(n, axis=-1)
    incidence = jnp.abs(jnp.sum(n * v, axis=-1)) / jnp.maximum(
        ray_len * nrm, _EPS
    )
    return v, n, ok & (incidence > incidence_min)


def subsample_count(cam: CameraIntrinsics, stride: int) -> int:
    H = (cam.height - stride // 2 + stride - 1) // stride
    W = (cam.width - stride // 2 + stride - 1) // stride
    return H * W


def empty_window(K: int, P: int) -> BAWindow:
    return BAWindow(
        poses=jnp.tile(jnp.eye(4, dtype=jnp.float32), (K, 1, 1)),
        v_c=jnp.zeros((K, P, 3), jnp.float32),
        n_c=jnp.zeros((K, P, 3), jnp.float32),
        valid=jnp.zeros((K, P), bool),
        odo=jnp.tile(jnp.eye(4, dtype=jnp.float32), (max(K - 1, 1), 1, 1)),
        prior_H=jnp.zeros((6, 6), jnp.float32),
        prior_b=jnp.zeros((6,), jnp.float32),
        prior_T0=jnp.eye(4, dtype=jnp.float32),
        n_valid=jnp.int32(0),
    )


# ---------------------------------------------------------------------------
# Residual assembly
# ---------------------------------------------------------------------------

def _frame_to_map_block(
    at: ActiveTable,
    pose: jax.Array,
    v_c: jax.Array,
    n_c: jax.Array,
    valid: jax.Array,
    time: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
    stride: int,
    max_residual: float,
    huber_delta: float,
):
    """One frame's point-to-plane normal equations against the active table.

    Same gates as icp.refine_pose (angle 0.5 rad = data.vert:158, residual
    clamp, Huber): returns (A 6x6, b 6, n_inliers).  ``stride`` must match
    the grid ``v_c`` was subsampled on (subsample_frame)."""
    T_inv = invert_se3(pose)
    # XLA z-buffer path: this runs under jax.vmap over the K window frames,
    # where the Pallas kernel cannot lower batched HBM operands
    idx = index_active(at, T_inv, time, cam, params, allow_pallas=False)
    fa = params.index_factor
    # take the index pixel of each stride cell's center: a point at depth
    # pixel center (c + 0.5) rasterizes to supersampled pixel
    # ceil(fa*(c+0.5)) - 1 = fa*c + ceil(fa/2) - 1, so the slice start is
    # (stride//2)*fa + (fa - 1)//2 (== (stride//2)*fa for fa <= 2)
    start = (stride // 2) * fa + (fa - 1) // 2
    sl = (
        slice(start, cam.height * fa, stride * fa),
        slice(start, cam.width * fa, stride * fa),
    )
    ids = idx[sl].reshape(-1)
    has = ids >= 0
    safe = jnp.clip(ids, 0, at.size - 1)
    p_w = jnp.stack([at.x[safe], at.y[safe], at.z[safe]], axis=-1)
    n_w = jnp.stack([at.nx[safe], at.ny[safe], at.nz[safe]], axis=-1)
    n_w = n_w / jnp.maximum(jnp.linalg.norm(n_w, axis=-1, keepdims=True), _EPS)

    R = pose[:3, :3]
    v_w = jnp.matmul(v_c, R.T, precision=HIGHEST) + pose[:3, 3]
    n_fw = jnp.matmul(n_c, R.T, precision=HIGHEST)
    r = jnp.sum(n_w * (v_w - p_w), axis=-1)
    dist = jnp.linalg.norm(v_w - p_w, axis=-1)
    angle_ok = jnp.sum(n_fw * n_w, axis=-1) > 0.878
    ok = (
        valid & has & angle_ok
        & (jnp.abs(r) < max_residual)
        & (dist < 4.0 * max_residual)
    )
    w = jnp.where(
        jnp.abs(r) < huber_delta, 1.0, huber_delta / jnp.maximum(jnp.abs(r), _EPS)
    )
    w = jnp.where(ok, w, 0.0)
    A, b, _ = _normal_equations(v_w, p_w, n_w, w)
    return A, b, jnp.sum(ok)


def _odometry_edge(T_k: jax.Array, T_k1: jax.Array, Z: jax.Array):
    """Linearized odometry edge: residual r0 and jacobian E with
    r(delta) ~ r0 + E (delta_{k+1} - delta_k),  E = Adj(T_{k+1}^-1)."""
    r0 = log_se3(compose(invert_se3(Z), compose(invert_se3(T_k), T_k1)))
    E = adjoint_se3(invert_se3(T_k1))
    return E, r0


# ---------------------------------------------------------------------------
# The windowed solve
# ---------------------------------------------------------------------------

def _assemble_and_solve(
    diag_A: jax.Array,    # f32[K,6,6] frame-to-map blocks
    diag_b: jax.Array,    # f32[K,6]
    E: jax.Array,         # f32[K-1,6,6] odometry edge jacobians
    r0: jax.Array,        # f32[K-1,6]
    odo_w: jax.Array,     # f32[K-1]
    frame_mask: jax.Array,  # bool[K] occupied frames
    prior_H: jax.Array,   # f32[6,6]
    prior_g: jax.Array,   # f32[6] prior gradient at CURRENT pose-0 estimate
    damping: float,
) -> jax.Array:
    """Build the block-tridiagonal 6K x 6K system, solve for stacked twist
    updates [K,6].  Unoccupied frames get identity rows (delta = 0)."""
    K = diag_A.shape[0]
    fm = frame_mask.astype(jnp.float32)
    ew = odo_w * fm[:-1] * fm[1:]

    EtE = jnp.einsum("kij,kil->kjl", E, E, precision=HIGHEST) * ew[:, None, None]
    Etr = jnp.einsum("kij,ki->kj", E, r0, precision=HIGHEST) * ew[:, None]

    # diagonal blocks: map term + incident edges + prior on pose 0
    diag = diag_A * fm[:, None, None]
    diag = diag.at[:-1].add(EtE)
    diag = diag.at[1:].add(EtE)
    diag = diag.at[0].add(prior_H)
    g = diag_b * fm[:, None]
    g = g.at[:-1].add(Etr)      # J_k = -E  => g_k += E^T r w
    g = g.at[1:].add(-Etr)      # J_{k+1} = +E => g_{k+1} -= E^T r w
    g = g.at[0].add(prior_g)

    # dense 6K x 6K assembly (K is tiny; clarity over sparsity)
    Hm = jnp.zeros((K, 6, K, 6), jnp.float32)
    Hm = Hm.at[jnp.arange(K), :, jnp.arange(K), :].set(diag)
    Hm = Hm.at[jnp.arange(K - 1), :, jnp.arange(1, K), :].add(-EtE)
    Hm = Hm.at[jnp.arange(1, K), :, jnp.arange(K - 1), :].add(-EtE)
    Hm = Hm.reshape(6 * K, 6 * K)
    g = g.reshape(6 * K)

    dm = jnp.diag(Hm)
    scale = jnp.max(dm) + 1.0
    empty = jnp.repeat(~frame_mask, 6)
    Hm = Hm + jnp.diag(damping * dm + 1e-6 * scale + empty * scale)
    delta = jax.scipy.linalg.solve(Hm, g, assume_a="pos")
    delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
    return delta.reshape(K, 6)


def _psum_if(axis_name, *trees):
    if axis_name is None:
        return trees
    return tuple(jax.lax.psum(t, axis_name) for t in trees)


@functools.partial(
    jax.jit,
    static_argnames=("cam", "params", "stride", "iters", "axis_name"),
)
def refine_window(
    win: BAWindow,
    at: ActiveTable,
    time: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
    stride: int = 4,
    iters: int = 3,
    odo_weight: float = 1e4,
    max_residual: float = 0.5,
    huber_delta: float = 0.05,
    damping: float = 1e-2,
    axis_name: str | None = None,
):
    """Gauss-Newton over the whole window against the active table.

    ``at`` is the gathered in-frustum working set (ops/active.py) — pass
    ``table_from_map(smap)`` for small maps.  With ``axis_name`` set (inside
    shard_map over a map-sharded mesh) the per-frame normal equations psum
    across shards before the solve; every replica computes the identical
    update.

    Returns (window with refined poses, diagnostics dict).
    """
    K = win.poses.shape[0]
    frame_mask = jnp.arange(K) < win.n_valid

    def gn_iter(_, carry):
        poses, _ = carry

        def per_frame(pose, v_c, n_c, valid):
            return _frame_to_map_block(
                at, pose, v_c, n_c, valid, time, cam, params, stride,
                max_residual, huber_delta,
            )

        dA, db, n_in = jax.vmap(per_frame)(poses, win.v_c, win.n_c, win.valid)
        # distributed Schur reduction: sum per-shard systems over the mesh
        dA, db, n_tot = _psum_if(axis_name, dA, db, n_in)
        # per-inlier evidence normalization (see BA_EVIDENCE)
        norm = BA_EVIDENCE / jnp.maximum(n_tot.astype(jnp.float32), 1.0)
        dA = dA * norm[:, None, None]
        db = db * norm[:, None]

        E, r0 = jax.vmap(_odometry_edge)(poses[:-1], poses[1:], win.odo)
        # prior gradient re-anchored at the current pose-0 estimate:
        # r_p = log(T0_cur T0_lin^-1),  g_p = prior_b - prior_H r_p
        rp = log_se3(compose(poses[0], invert_se3(win.prior_T0)))
        prior_g = win.prior_b - jnp.matmul(win.prior_H, rp, precision=HIGHEST)

        delta = _assemble_and_solve(
            dA, db, E, r0,
            jnp.full((K - 1,), odo_weight, jnp.float32),
            frame_mask, win.prior_H, prior_g, damping,
        )
        # trust region per pose (icp.py:130 discipline)
        tn = jnp.linalg.norm(delta[:, :3], axis=-1, keepdims=True)
        rn = jnp.linalg.norm(delta[:, 3:], axis=-1, keepdims=True)
        sc = jnp.minimum(
            1.0,
            jnp.minimum(0.3 / jnp.maximum(tn, _EPS), 0.1 / jnp.maximum(rn, _EPS)),
        )
        delta = delta * sc * frame_mask[:, None]
        poses = jax.vmap(lambda d, T: compose(exp_se3(d), T))(delta, poses)
        return poses, jnp.sum(n_in)

    poses, n_in = jax.lax.fori_loop(
        0, iters, gn_iter, (win.poses, jnp.int32(0))
    )
    return dataclasses.replace(win, poses=poses), {"inliers": n_in}


# ---------------------------------------------------------------------------
# Sliding / marginalization
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cam", "params", "stride"))
def marginalize_oldest(
    win: BAWindow,
    at: ActiveTable,
    time: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
    stride: int = 4,
    odo_weight: float = 1e4,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Schur-complement the oldest pose out of the (pre-slide) window system.

    Rebuilds the (pose0, pose1) sub-system at the current estimates — pose0's
    frame-to-map block, the 0-1 odometry edge, and pose0's existing prior —
    then eliminates pose0:

        H' = H_11 - H_10 H_00^-1 H_01,   b' = b_1 - H_10 H_00^-1 b_0

    Returns (prior_H 6x6, prior_b 6, prior_T0 = pose1 linearization point)
    for attachment to the slid window's new pose 0."""
    A0, b0, n0 = _frame_to_map_block(
        at, win.poses[0], win.v_c[0], win.n_c[0], win.valid[0],
        time, cam, params, stride, 0.5, 0.05,
    )
    norm0 = BA_EVIDENCE / jnp.maximum(n0.astype(jnp.float32), 1.0)
    A0 = A0 * norm0
    b0 = b0 * norm0
    E, r0 = _odometry_edge(win.poses[0], win.poses[1], win.odo[0])
    EtE = jnp.matmul(E.T, E, precision=HIGHEST) * odo_weight
    Etr = jnp.matmul(E.T, r0, precision=HIGHEST) * odo_weight
    # prior gradient at current pose 0
    rp = log_se3(compose(win.poses[0], invert_se3(win.prior_T0)))
    g_pr = win.prior_b - jnp.matmul(win.prior_H, rp, precision=HIGHEST)

    H00 = A0 + win.prior_H + EtE
    H11 = EtE
    H01 = -EtE
    g0 = b0 + g_pr + Etr
    g1 = -Etr
    dm = jnp.diag(H00)
    H00 = H00 + jnp.diag(1e-2 * dm + 1e-6 * jnp.max(dm) + 1e-9)
    X = jax.scipy.linalg.solve(
        H00, jnp.concatenate([H01, g0[:, None]], axis=1), assume_a="pos"
    )
    Hs = H11 - jnp.matmul(H01.T, X[:, :6], precision=HIGHEST)
    bs = g1 - jnp.matmul(H01.T, X[:, 6], precision=HIGHEST)
    ok = jnp.all(jnp.isfinite(Hs)) & jnp.all(jnp.isfinite(bs))
    Hs = jnp.where(ok, Hs, jnp.zeros_like(Hs))
    bs = jnp.where(ok, bs, jnp.zeros_like(bs))
    # symmetrize against numerical drift
    Hs = 0.5 * (Hs + Hs.T)
    return Hs, bs, win.poses[1]


class WindowedBA:
    """Host-side sliding-window driver.

    Feed each frame's preprocessed metric depth + odometry pose estimate
    (GT, ICP output, or motion model); it maintains the window and returns
    the BA-refined pose for the newest frame.  Map association runs on an
    ActiveTable the caller provides per frame (table_from_map(smap) for
    small maps, the fusion step's gathered table in deployment)."""

    def __init__(
        self,
        cam: CameraIntrinsics,
        params: PipelineParams,
        window: int = 5,
        stride: int = 4,
        iters: int = 3,
        odo_weight: float = 1e4,
        gauge_weight: float = 1e2,
        prior_decay: float = 0.0,
    ):
        self.cam = cam
        self.params = params
        self.K = window
        self.stride = stride
        self.iters = iters
        self.odo_weight = odo_weight
        # Marginalization-prior weight: each slide multiplies the Schur
        # prior by this factor before carrying it.  Default 0.0 DISCARDS it:
        # unlike odometry-only sliding-window VO, every window pose here is
        # ABSOLUTELY anchored by its frame-to-map point-to-plane terms, so
        # the marginalization prior re-counts old map information at a stale
        # linearization point — pure bias, no missing information.  Measured
        # (tools/sweep_ba.py, round 5): ICP+BA rmse = 0.63x ICP-only at 0.0,
        # but 2.3-2.7x WORSE at 0.3 (the round-4 default) and 0.7.  Set > 0
        # only when map association can drop out for many frames and the
        # window must coast on odometry + memory (cf. the dropout test).
        self.prior_decay = prior_decay
        self.P = subsample_count(cam, stride)
        self.win = empty_window(window, self.P)
        self._gauge = gauge_weight
        # last RAW odometry pose: odometry edges are formed between
        # consecutive raw odometry estimates, NOT against the BA-refined
        # window poses — otherwise every BA correction to frame k-1 leaks
        # into edge (k-1, k) as spurious relative motion with weight odo_w.
        self._last_odo: jax.Array | None = None
        self.last_diag: dict = {}
        self._sub = jax.jit(
            functools.partial(
                subsample_frame, cam=cam, params=params, stride=stride
            )
        )

    def push(self, depth_metric, pose_odo, at=None, time: float = 0.0) -> None:
        """Append a frame; when the window is full, marginalizes the oldest
        pose (Schur complement against ``at``; pure odometry+prior if ``at``
        is None) and slides."""
        v, n, ok = self._sub(depth_metric)
        w = self.win
        K = self.K
        nv = int(w.n_valid)
        pose_odo = jnp.asarray(pose_odo, jnp.float32)
        prev_odo, self._last_odo = self._last_odo, pose_odo
        if nv == 0:
            w = dataclasses.replace(
                w,
                prior_H=jnp.eye(6, dtype=jnp.float32) * self._gauge,
                prior_b=jnp.zeros((6,), jnp.float32),
                prior_T0=pose_odo,
                poses=w.poses.at[0].set(pose_odo),
                v_c=w.v_c.at[0].set(v),
                n_c=w.n_c.at[0].set(n),
                valid=w.valid.at[0].set(ok),
                n_valid=jnp.int32(1),
            )
            self.win = w
            return
        if prev_odo is None:
            prev_odo = pose_odo  # defensive: identity relative motion
        if nv < K:
            i = nv
            z = compose(invert_se3(prev_odo), pose_odo)
            # initial estimate chains the raw relative motion onto the
            # refined previous estimate (not the raw absolute pose)
            pose_init = compose(w.poses[i - 1], z)
            self.win = dataclasses.replace(
                w,
                poses=w.poses.at[i].set(pose_init),
                v_c=w.v_c.at[i].set(v),
                n_c=w.n_c.at[i].set(n),
                valid=w.valid.at[i].set(ok),
                odo=w.odo.at[i - 1].set(z),
                n_valid=jnp.int32(i + 1),
            )
            return
        # full window: Schur-marginalize pose 0, then slide
        if at is not None:
            Hs, bs, T0 = marginalize_oldest(
                w, at, jnp.float32(time), self.cam, self.params,
                self.stride, self.odo_weight,
            )
            Hs = Hs * self.prior_decay
            bs = bs * self.prior_decay
        else:
            # odometry-only elimination (map term absent): keep the window
            # anchored by a weak prior at the old pose-1 estimate
            Hs = jnp.eye(6, dtype=jnp.float32) * min(self._gauge, 1e4)
            bs = jnp.zeros((6,), jnp.float32)
            T0 = w.poses[1]
        z_new = compose(invert_se3(prev_odo), pose_odo)
        pose_init = compose(w.poses[K - 1], z_new)
        self.win = dataclasses.replace(
            w,
            poses=jnp.concatenate([w.poses[1:], pose_init[None]], axis=0),
            v_c=jnp.concatenate([w.v_c[1:], v[None]], axis=0),
            n_c=jnp.concatenate([w.n_c[1:], n[None]], axis=0),
            valid=jnp.concatenate([w.valid[1:], ok[None]], axis=0),
            odo=jnp.concatenate([w.odo[1:], z_new[None]], axis=0),
            prior_H=Hs,
            prior_b=bs,
            prior_T0=T0,
        )

    def refine(self, at, time: float, axis_name=None) -> np.ndarray:
        """Run GN over the window; returns the refined newest pose (4x4)."""
        self.win, diag = refine_window(
            self.win, at, jnp.float32(time), self.cam, self.params,
            self.stride, self.iters, self.odo_weight, axis_name=axis_name,
        )
        self.last_diag = {k: int(v) for k, v in diag.items()}
        nv = int(self.win.n_valid)
        return np.asarray(self.win.poses[min(nv, self.K) - 1])

    def poses_out(self) -> np.ndarray:
        """Current window pose estimates [n_valid, 4, 4]."""
        nv = int(self.win.n_valid)
        return np.asarray(self.win.poses[:nv])
