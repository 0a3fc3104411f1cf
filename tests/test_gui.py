"""Viewer (gui.py) checks: palette/depth panel semantics and the headless
snapshot path (the reference GUI's supervision view without a GL context)."""

import numpy as np

from surfelmapping_tpu.gui import (
    MappingGUI,
    SEMANTIC_PALETTE,
    colorize_semantic,
    normalize_depth,
)
from surfelmapping_tpu.io.synthetic import tiny_cam


def test_depth_normalization_and_palette():
    d = np.array([[0.0, 15.0], [30.0, 60.0]], np.float32)
    img = normalize_depth(d, far=30.0)
    assert img[0, 0] == 0          # hole stays 0
    assert img[0, 1] == 127        # mid-range
    assert img[1, 0] == 255 and img[1, 1] == 255  # clipped at far

    sem = np.array([[0, 10], [18, -1]], np.int32)
    rgb = colorize_semantic(sem)
    assert (rgb[0, 0] == SEMANTIC_PALETTE[0]).all()
    assert (rgb[0, 1] == SEMANTIC_PALETTE[10]).all()  # sky
    assert (rgb[1, 1] == 0).all()                     # invalid -> black


def test_headless_snapshot_update(tmp_path):
    cam = tiny_cam(64, 48)
    gui = MappingGUI(cam, snapshot_dir=str(tmp_path), snapshot_every=1)
    assert not gui.interactive
    rgb = np.zeros((48, 64, 3), np.uint8)
    depth = np.full((48, 64), 5.0, np.float32)
    sem = np.zeros((48, 64), np.int32)
    render = {
        "rgb": np.zeros((48, 64, 3), np.float32),
        "semantic": np.ones((48, 64), np.int32),
        "depth": depth,
    }
    gui.update(rgb, depth, sem, render, status="t")
    gui.update(rgb, depth, sem, None)
    gui.close()
    snaps = sorted(tmp_path.iterdir())
    assert len(snaps) == 2
