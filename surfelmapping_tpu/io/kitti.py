"""KITTI-layout dataset reader (reference gui/KittiReader.{h,cpp} parity).

Directory layout (gui/KittiReader.cpp:27-44):
    <dir>/times.txt         one float per frame
    <dir>/calibration.txt   line 1: "fx fy cx cy", line 2: "width height"
    <dir>/pose.txt          3x4 row-major ground-truth poses (cam0 frame)
    <dir>/image_2/NNNNNN.png    RGB
    <dir>/PSMNet/NNNNNN.png     uint16 depth in mm
    <dir>/semantics/NNNNNN.png  uint8 class labels

Reproduced behaviours:
  * poses are right-multiplied by the fixed stereo-baseline correction
    T20 = translate(x: -0.06) (gui/KittiReader.cpp:290-298);
  * file names are zero-padded 6-digit ids (gui/KittiReader.cpp:63-70);
  * OpenCV imread returns BGR which the reference swaps to RGB
    (gui/KittiReader.cpp:130-134) — PIL already yields RGB;
  * optional ``sub_level`` halves resolution per level; the reference halves
    intrinsics once regardless of level and warns about odd sizes
    (gui/KittiReader.cpp:248-259) — we divide by 2**sub_level (documented
    divergence: the reference's /2 for sub_level>1 is an acknowledged bug,
    and its semantic-subsample path writes into the depth buffer,
    gui/KittiReader.cpp:199-212, which we do not reproduce);
  * getNext/getLast/saveState/resumeState frame-cursor semantics
    (gui/DatasetReader.cpp:86-99).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..config import CameraIntrinsics

try:
    import cv2  # type: ignore

    _HAVE_CV2 = True
except Exception:  # pragma: no cover
    _HAVE_CV2 = False
    from PIL import Image


def _imread_rgb(path: str) -> np.ndarray:
    if _HAVE_CV2:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return img[:, :, ::-1].copy()
    return np.asarray(Image.open(path).convert("RGB"))


def _imread_u16(path: str) -> np.ndarray:
    if _HAVE_CV2:
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise FileNotFoundError(path)
        return img.astype(np.uint16)
    return np.asarray(Image.open(path)).astype(np.uint16)


def _imread_u8(path: str) -> np.ndarray:
    if _HAVE_CV2:
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(path)
        return img.astype(np.uint8)
    return np.asarray(Image.open(path).convert("L")).astype(np.uint8)


@dataclass
class Frame:
    frame_id: int
    time: float
    rgb: np.ndarray       # u8[H,W,3]
    depth: np.ndarray     # u16[H,W] mm
    semantic: np.ndarray  # u8[H,W]
    pose: np.ndarray      # f32[4,4] camera-to-world (gt, baseline-corrected)


# stereo-baseline correction applied to every gt pose
# (gui/KittiReader.cpp:290-298)
T20 = np.array(
    [[1, 0, 0, -0.06], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], dtype=np.float32
)


class KittiReader:
    def __init__(self, dataset_dir: str, sub_level: int = 0, use_native: bool = True):
        self.dir = dataset_dir
        self.sub_level = sub_level
        self.times = self._load_times()
        self.cam = self._load_calibration()
        self.poses = self._load_ground_truth()
        self.current = -1
        self._saved = -1
        self._prefetcher = None
        self._pf_next = 0
        if use_native:
            # multithreaded libpng prefetcher (csrc/surfelio.cpp) keeps frames
            # decoded ahead of the accelerator; silently falls back to
            # cv2/PIL when the native library is unavailable
            try:
                from .native import FramePrefetcher, ensure_built

                if ensure_built():
                    self._prefetcher = FramePrefetcher(
                        os.path.join(self.dir, "image_2"),
                        os.path.join(self.dir, "PSMNet"),
                        os.path.join(self.dir, "semantics"),
                        0,
                        len(self.times) - 1,
                    )
            except Exception:
                self._prefetcher = None

    # -- loading ----------------------------------------------------------

    def _load_times(self) -> list[float]:
        with open(os.path.join(self.dir, "times.txt")) as f:
            return [float(line.strip()) for line in f if line.strip()]

    def _load_calibration(self) -> CameraIntrinsics:
        with open(os.path.join(self.dir, "calibration.txt")) as f:
            fx, fy, cx, cy = map(float, f.readline().split()[:4])
            w, h = map(int, f.readline().split()[:2])
        s = 1 << self.sub_level
        if self.sub_level:
            fx, fy, cx, cy = fx / s, fy / s, cx / s, cy / s
            w, h = w >> self.sub_level, h >> self.sub_level
        return CameraIntrinsics(fx=fx, fy=fy, cx=cx, cy=cy, width=w, height=h)

    def _load_ground_truth(self) -> np.ndarray:
        path = os.path.join(self.dir, "pose.txt")
        poses = []
        with open(path) as f:
            for line in f:
                vals = [float(x) for x in line.split()]
                if len(vals) < 12:
                    continue
                T = np.eye(4, dtype=np.float32)
                T[:3, :4] = np.asarray(vals[:12], np.float32).reshape(3, 4)
                poses.append(T @ T20)
        assert len(poses) == len(self.times), "ground truth and times not matched!"
        return np.stack(poses)

    # -- frame access -----------------------------------------------------

    def __len__(self) -> int:
        return len(self.times)

    def _name(self, idx: int) -> str:
        return f"{idx:06d}.png"

    def _load(self, idx: int) -> Frame:
        # the native prefetcher decodes strictly forward; sequential reads hit
        # it, random/backward access (cleanPoints replay) decodes directly
        if self._prefetcher is not None and idx == self._pf_next:
            try:
                rgb, depth, sem = self._prefetcher.get(idx)
                self._pf_next = idx + 1
            except RuntimeError:
                self._prefetcher = None
                return self._load(idx)
        else:
            rgb = _imread_rgb(os.path.join(self.dir, "image_2", self._name(idx)))
            depth = _imread_u16(os.path.join(self.dir, "PSMNet", self._name(idx)))
            sem = _imread_u8(os.path.join(self.dir, "semantics", self._name(idx)))
        if self.sub_level:
            s = 1 << self.sub_level
            rgb = rgb[::s, ::s]
            depth = depth[::s, ::s]
            sem = sem[::s, ::s]
        H, W = self.cam.height, self.cam.width
        rgb, depth, sem = rgb[:H, :W], depth[:H, :W], sem[:H, :W]
        return Frame(
            frame_id=idx,
            time=self.times[idx],
            rgb=rgb,
            depth=depth,
            semantic=sem,
            pose=self.poses[idx],
        )

    def get_next(self) -> Frame | None:
        """Advance and return the next frame (DatasetReader::getNext)."""
        if self.current + 1 >= len(self):
            return None
        self.current += 1
        return self._load(self.current)

    def get_last(self) -> Frame | None:
        """Step backwards (DatasetReader::getLast) — used by the cleanPoints
        replay loop (build_map.cpp:306-326)."""
        if self.current - 1 < 0:
            return None
        self.current -= 1
        return self._load(self.current)

    def save_state(self) -> None:
        self._saved = self.current

    def resume_state(self) -> None:
        self.current = self._saved

    def set_state(self, frame_id: int) -> None:
        self.current = frame_id
