"""Offline visualization — the headless analogue of the reference's Pangolin
GUI (gui/GUI.{h,cpp} + the draw_surface shader family).

The reference's interactive window offers: surfel rendering in
mono/normal/rgb/semantic color modes (draw_surface.vert +
draw_surface_adaptive.geom), normalized-depth and semantic-palette image
panels (GUI::normalizeDepth / processSemantic, gui/GUI.cpp:199-273), frustum
drawing and a capacity overlay.  A TPU batch engine has no window; this
module renders the same content to PNG files / numpy arrays.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .config import CameraIntrinsics
from .ops.colors import SEMANTIC_PALETTE, semantic_to_rgb
from .ops.splat import splat_render
from .surfels import SurfelMap


def normalize_depth(depth: np.ndarray, min_d: float, max_d: float) -> np.ndarray:
    """GUI::normalizeDepth (depth_norm_float.frag): linear map to u8 gray."""
    d = np.asarray(depth, np.float32)
    g = np.clip((d - min_d) / max(max_d - min_d, 1e-6), 0.0, 1.0)
    g = np.where(d <= 0, 0.0, g)
    return (g * 255).astype(np.uint8)


def semantic_image(semantic: np.ndarray) -> np.ndarray:
    """GUI::processSemantic (show_semantic.frag): palette colorization."""
    return np.asarray(semantic_to_rgb(jnp.asarray(semantic)))


def render_map_view(
    smap: SurfelMap,
    view: np.ndarray,
    cam: CameraIntrinsics,
    mode: str = "rgb",
    footprint: int = 5,
) -> np.ndarray:
    """Render the map in one of the reference's draw modes
    (draw_surface.vert color modes): 'rgb', 'semantic', 'normal', 'mono',
    'confidence', 'depth' -> u8[H,W,3]."""
    # single-window path: viewer output should not crop large splats when
    # the bucketed side table overflows on dense maps
    out = splat_render(smap, jnp.asarray(view, jnp.float32), cam,
                       footprint=footprint, small_footprint=None)
    ids = np.asarray(out["id"])
    hole = ids < 0
    safe = np.clip(ids, 0, smap.capacity - 1)
    if mode == "rgb":
        img = np.asarray(out["rgb"]) * 255.0
    elif mode == "semantic":
        img = semantic_image(np.maximum(np.asarray(out["semantic"]) - 1, 0)).astype(
            np.float32
        )
        img[np.asarray(out["semantic"]) == 0] = 0
    elif mode == "normal":
        n = np.asarray(smap.normal())[safe]
        img = (n * 0.5 + 0.5) * 255.0
    elif mode == "confidence":
        c = np.asarray(smap.conf)[safe]
        g = np.clip(c / max(c.max(), 1e-6), 0, 1)[..., None] * 255.0
        img = np.repeat(g, 3, axis=-1)
    elif mode == "depth":
        g = normalize_depth(np.asarray(out["depth"]), 1.0, 30.0)[..., None]
        img = np.repeat(g, 3, axis=-1).astype(np.float32)
    else:  # mono
        img = np.full(ids.shape + (3,), 200.0, np.float32)
    img[hole] = 0
    return np.clip(img, 0, 255).astype(np.uint8)


def overview_pose(traj_pose: np.ndarray, height: float = 30.0) -> np.ndarray:
    """Bird's-eye pose above a trajectory frame looking down — the GUI's
    overview fly-through camera (load_map.cpp:254-287 / build_map follow)."""
    T = np.asarray(traj_pose, np.float32).copy()
    look_down = np.array(
        [[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 0], [0, 0, 0, 1]], np.float32
    )
    lift = np.eye(4, dtype=np.float32)
    lift[1, 3] = -height  # y is down
    return T @ lift @ look_down


def save_png(img: np.ndarray, path: str) -> None:
    from PIL import Image

    Image.fromarray(img).save(path)
