"""Parity metrics: rendered-image PSNR and trajectory error.

BASELINE.md defines the self-measured parity targets (the reference publishes
no numbers): surfel count / rendered PSNR on the mapped sequence, ATE once
ICP replaces gt poses, and frames/s per chip.
"""

from __future__ import annotations

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, mask: np.ndarray | None = None,
         peak: float = 1.0) -> float:
    """PSNR between two images; with ``mask`` only masked pixels count
    (novel-view renders have holes — compare where a splat landed)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if mask is not None:
        m = np.broadcast_to(np.asarray(mask)[..., None] if a.ndim == 3 and mask.ndim == 2 else mask, a.shape)
        diff2 = ((a - b) ** 2)[m]
    else:
        diff2 = (a - b) ** 2
    mse = diff2.mean() if diff2.size else np.inf
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / mse))


def render_vs_frame_psnr(mapper, rgb_frame: np.ndarray, pose: np.ndarray,
                         footprint: int = 5) -> tuple[float, float]:
    """Render the map at ``pose`` and compare with the captured RGB frame.
    Returns (psnr_on_hits, hit_fraction)."""
    import jax.numpy as jnp

    from .ops.splat import splat_render

    # small_footprint=None: single-window exact path — parity metrics must
    # never quietly degrade through cropped large-bucket splats
    out = splat_render(mapper.smap, jnp.asarray(pose, jnp.float32), mapper.cam,
                       footprint=footprint, small_footprint=None)
    rendered = np.asarray(out["rgb"])
    sem = np.asarray(out["semantic"])
    hits = sem > 0
    frame = np.asarray(rgb_frame, np.float64)
    if frame.max() > 1.5:
        frame = frame / 255.0
    return psnr(rendered, frame, hits), float(hits.mean())


def absolute_trajectory_error(est: np.ndarray, gt: np.ndarray) -> dict:
    """ATE between pose sequences [N,4,4] (translation RMSE/mean/max, m)."""
    est = np.asarray(est)
    gt = np.asarray(gt)
    d = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
    return {
        "rmse": float(np.sqrt((d ** 2).mean())),
        "mean": float(d.mean()),
        "max": float(d.max()),
    }
