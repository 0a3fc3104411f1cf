"""Interactive mapping viewer (reference gui/GUI.{h,cpp} analogue).

The reference drives a Pangolin window with panel buttons (pause / step /
save / reset / clean / path mode / acquire) and picture-in-picture views of
the input RGB, normalized depth, semantic palette and the rendered model
(gui/GUI.cpp:56-135,199-273; button loop build_map.cpp:25-271).  This
TPU-side analogue uses matplotlib's event loop — no GL context — with the
same control surface:

  keys:  space pause/resume . step (while paused) m cycle model view
         s save map         c backward clean      r reset map
         v render a novel view offset from the current pose   q quit

Headless environments (no DISPLAY) fall back to writing the same 4-panel
figure to PNG every ``snapshot_every`` frames — the supervision view
without a window.

Usage:  python build_map.py <dataset> --gui        (or --gui-snapshots DIR)
"""

from __future__ import annotations

import os
import time

import numpy as np

# cityscapes-style 19-class palette (reference semantic palette,
# src/GlobalModel.cpp:718-736), index = trainId, RGB
SEMANTIC_PALETTE = np.asarray([
    [128, 64, 128], [244, 35, 232], [70, 70, 70], [102, 102, 156],
    [190, 153, 153], [153, 153, 153], [250, 170, 30], [220, 220, 0],
    [107, 142, 35], [152, 251, 152], [70, 130, 180], [220, 20, 60],
    [255, 0, 0], [0, 0, 142], [0, 0, 70], [0, 60, 100],
    [0, 80, 100], [0, 0, 230], [119, 11, 32],
], np.uint8)


def normalize_depth(depth_m: np.ndarray, far: float = 30.0) -> np.ndarray:
    """GUI depth panel: metric depth -> u8 grey, 0 = hole
    (gui/GUI.cpp normalizeDepth semantics)."""
    d = np.clip(np.asarray(depth_m, np.float32) / far, 0.0, 1.0)
    img = (d * 255).astype(np.uint8)
    img[np.asarray(depth_m) <= 0] = 0
    return img


def colorize_semantic(sem: np.ndarray) -> np.ndarray:
    """GUI semantic panel: class image -> palette RGB (show_semantic.frag)."""
    s = np.clip(np.asarray(sem, np.int64), 0, len(SEMANTIC_PALETTE) - 1)
    out = SEMANTIC_PALETTE[s]
    out[np.asarray(sem) < 0] = 0
    return out


class MappingGUI:
    """Four-panel supervision view + keyboard control state.

    The engine loop (build_map.py) calls :meth:`update` once per frame and
    honours the flags the key handler sets — the same split as the
    reference's ``rungui`` (GUI owns widgets, the loop owns the engine)."""

    MODEL_VIEWS = ("rgb", "semantic", "depth")

    def __init__(self, cam, snapshot_dir: str | None = None,
                 snapshot_every: int = 20):
        self.cam = cam
        self.paused = False
        self.step_once = False
        self.want_save = False
        self.want_clean = False
        self.want_reset = False
        self.want_novel = False
        self.quit = False
        self.model_view = 0
        self.snapshot_every = snapshot_every
        self._frame_no = 0
        self._last_draw = 0.0

        self.interactive = bool(os.environ.get("DISPLAY")) and snapshot_dir is None
        self.snapshot_dir = snapshot_dir
        if not self.interactive and snapshot_dir is None:
            self.snapshot_dir = "gui_snapshots"
        if self.snapshot_dir:
            os.makedirs(self.snapshot_dir, exist_ok=True)

        import matplotlib

        if not self.interactive:
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        self._plt = plt
        self.fig, axes = plt.subplots(2, 2, figsize=(12, 5))
        self.fig.canvas.manager.set_window_title("surfelmapping_tpu") \
            if self.interactive else None
        self.axes = axes.ravel()
        for ax, title in zip(self.axes, ("input rgb", "depth (metric)",
                                         "semantic", "model render")):
            ax.set_title(title, fontsize=9)
            ax.axis("off")
        H, W = cam.height, cam.width
        blank = np.zeros((H, W, 3), np.uint8)
        self.ims = [self.axes[i].imshow(blank) for i in range(4)]
        self._status = self.fig.text(0.01, 0.01, "", fontsize=8)
        if self.interactive:
            self.fig.canvas.mpl_connect("key_press_event", self._on_key)
            plt.ion()
            plt.show(block=False)

    # -- control -----------------------------------------------------------

    def _on_key(self, event) -> None:
        k = event.key
        if k == " ":
            self.paused = not self.paused
        elif k == ".":
            self.step_once = True
        elif k == "s":
            self.want_save = True
        elif k == "c":
            self.want_clean = True
        elif k == "r":
            self.want_reset = True
        elif k == "v":
            self.want_novel = True
        elif k == "m":
            self.model_view = (self.model_view + 1) % len(self.MODEL_VIEWS)
        elif k == "q":
            self.quit = True

    def wait_if_paused(self) -> None:
        """Block the engine loop while paused (reference pause button),
        still pumping the event loop so keys keep working."""
        while self.interactive and self.paused and not self.quit:
            if self.step_once:
                self.step_once = False
                return
            self._plt.pause(0.05)

    # -- drawing -----------------------------------------------------------

    def update(self, rgb, depth_m, semantic, render: dict | None,
               status: str = "") -> None:
        """Refresh the four panels.  ``render`` is a splat_render output
        dict (or None to keep the previous model panel)."""
        self._frame_no += 1
        draw = self.interactive or (
            self.snapshot_dir and self._frame_no % self.snapshot_every == 0
        )
        if not draw:
            return
        now = time.time()
        if self.interactive and now - self._last_draw < 0.1:
            return  # cap redraw rate; engine throughput wins
        self._last_draw = now

        self.ims[0].set_data(np.asarray(rgb, np.uint8))
        self.ims[1].set_data(
            np.repeat(normalize_depth(depth_m)[..., None], 3, axis=-1)
        )
        self.ims[2].set_data(colorize_semantic(semantic))
        if render is not None:
            mode = self.MODEL_VIEWS[self.model_view]
            if mode == "rgb":
                img = np.clip(
                    np.asarray(render["rgb"]) * 255, 0, 255
                ).astype(np.uint8)
            elif mode == "semantic":
                img = colorize_semantic(np.asarray(render["semantic"]) - 1)
            else:
                img = np.repeat(
                    normalize_depth(np.asarray(render["depth"]))[..., None],
                    3, axis=-1,
                )
            self.ims[3].set_data(img)
            self.axes[3].set_title(f"model render ({mode})", fontsize=9)
        self._status.set_text(status)

        if self.interactive:
            self.fig.canvas.draw_idle()
            self._plt.pause(0.001)
        else:
            self.fig.savefig(
                os.path.join(self.snapshot_dir, f"frame_{self._frame_no:06d}.png"),
                dpi=80,
            )

    def close(self) -> None:
        self._plt.close(self.fig)
