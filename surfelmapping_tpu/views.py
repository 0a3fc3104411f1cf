"""Novel-view trajectory generators + image acquisition.

Counterparts of the reference's simulator data-generation paths:
  * random perturbed views (load_map.cpp:132-173): +-2 m lateral, +-1 m
    longitudinal, +-15 deg yaw around randomly chosen trajectory frames;
  * "S"-shaped sinusoidal sweep (load_map.cpp:176-215);
  * acquireImages: render each view and write paired image/semantic PNGs
    with 6-digit names (src/SurfelMapping.cpp:378-434).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from .config import CameraIntrinsics
from .surfels import SurfelMap


def _yaw_about_minus_y(theta: float) -> np.ndarray:
    """Rotation of theta about the (0,-1,0) axis (the reference's yaw axis,
    load_map.cpp:160)."""
    c, s = np.cos(theta), np.sin(theta)
    # axis (0,-1,0): equals rotation of -theta about +y
    R = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]], dtype=np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    return T


def _translate(x: float, y: float, z: float) -> np.ndarray:
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [x, y, z]
    return T


def random_novel_views(
    base_views: list[np.ndarray] | np.ndarray,
    num: int,
    seed: int = 0,
    max_x: float = 2.0,
    max_z: float = 1.0,
    max_yaw_deg: float = 15.0,
) -> list[np.ndarray]:
    """Random perturbations of random base frames (load_map.cpp:132-173;
    the reference generates 100*novelViewNum views)."""
    rng = np.random.default_rng(seed)
    base = np.asarray(base_views)
    out = []
    for _ in range(num):
        v = base[rng.integers(0, len(base))]
        x_off = rng.uniform(-max_x, max_x)
        z_off = rng.uniform(-max_z, max_z)
        theta = np.deg2rad(rng.uniform(-max_yaw_deg, max_yaw_deg))
        T = _translate(x_off, 0.0, z_off) @ _yaw_about_minus_y(theta)
        out.append((v @ T).astype(np.float32))
    return out


def s_shaped_views(
    base_views: list[np.ndarray] | np.ndarray,
    period: float,
    max_trans: float = 2.0,
    max_yaw_deg: float = 15.0,
) -> list[np.ndarray]:
    """Sinusoidal lateral sweep along the trajectory keyed by cumulative
    travelled distance (load_map.cpp:176-215; the reference uses
    period = 3 * novelViewNum)."""
    base = np.asarray(base_views)
    max_theta = np.deg2rad(max_yaw_deg)
    out = []
    total = 0.0
    last_t = base[0][:3, 3]
    for v in base:
        t = v[:3, 3]
        total += float(np.linalg.norm(t - last_t))
        last_t = t
        x_off = np.sin(total / period) * max_trans
        theta = -np.cos(total / period) * max_theta
        T = _translate(x_off, 0.0, 0.0) @ _yaw_about_minus_y(theta)
        out.append((v @ T).astype(np.float32))
    return out


def overview_views(
    base_views: list[np.ndarray] | np.ndarray,
    lift: float = 5.0,
    back: float = 1.0,
) -> list[np.ndarray]:
    """Overview fly-through: one lifted chase camera per trajectory frame —
    the reference's fourth simulation path (load_map.cpp:254-287): the view
    target is the pose position raised ``lift`` metres (y is down, so
    ``y - 5``), the eye sits ``back`` metres behind it along the pose's
    forward axis, and the camera looks at the target with the pose's up.
    The reference cycles ``overviewId`` through every model pose; this
    returns that sweep as camera-to-world matrices."""
    out = []
    for v in np.asarray(base_views, np.float32):
        R = v[:3, :3]
        fwd = R @ np.array([0, 0, 1], np.float32)
        up = R @ np.array([0, -1, 0], np.float32)
        view_at = v[:3, 3] + np.array([0, -lift, 0], np.float32)
        eye = view_at - back * fwd
        # the reference builds a GL modelview (x right, y up, z backward);
        # convert to our camera-to-world convention (y down, z forward)
        z_gl = eye - view_at
        z_gl /= max(np.linalg.norm(z_gl), 1e-9)
        x_gl = np.cross(up, z_gl)
        x_gl /= max(np.linalg.norm(x_gl), 1e-9)
        y_gl = np.cross(z_gl, x_gl)
        T = np.eye(4, dtype=np.float32)
        T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = x_gl, -y_gl, -z_gl, eye
        out.append(T)
    return out


def acquire_images(
    smap: SurfelMap,
    views: list[np.ndarray],
    path: str,
    cam: CameraIntrinsics,
    start_id: int = 0,
    footprint: int = 5,
) -> None:
    """Render every view and save image/semantic PNG pairs — the reference's
    acquireImages (src/SurfelMapping.cpp:378-434): <path>/image/NNNNNN.png
    (RGB) and <path>/semantic/NNNNNN.png (class+1, 0 = hole)."""
    from PIL import Image

    image_dir = os.path.join(path, "image")
    sem_dir = os.path.join(path, "semantic")
    os.makedirs(image_dir, exist_ok=True)
    os.makedirs(sem_dir, exist_ok=True)

    # render_view culls to the in-frustum blocks first: per-view cost scales
    # with visible surfels, not map capacity; the previous view's active
    # count feeds forward as the next cull budget (ops/splat.py)
    from .ops.splat import render_view

    hint = None
    for i, v in enumerate(views):
        out = render_view(smap, jnp.asarray(v, jnp.float32), cam,
                          footprint=footprint, start_blocks=hint)
        hint = int(out["n_active_blocks"]) + 1
        rgb = np.asarray(
            jnp.clip(jnp.round(out["rgb"] * 255.0), 0, 255).astype(jnp.uint8)
        )
        sem = np.asarray(out["semantic"].astype(jnp.uint8))
        name = f"{start_id + i:06d}.png"
        Image.fromarray(rgb).save(os.path.join(image_dir, name))
        Image.fromarray(sem).save(os.path.join(sem_dir, name))
