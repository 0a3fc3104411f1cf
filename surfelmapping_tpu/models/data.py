"""SPADE training data pipeline (numpy host-side, reference SPADE/data parity).

  * PairedRenderDataset = KittiDataset semantics (SPADE/data/kitti_dataset.py):
    label = rendered surfel image, image = real photo, paired by filename;
    train transform: resize shorter side to load_size, random crop
    crop_size x crop_size, horizontal flip, RandomErasing applied to the
    label ONLY (kitti_dataset.py:84-101) to simulate render holes;
  * RandomErasing (SPADE/util/random_erasing.py): p=0.8, area 2-30%, aspect
    0.3-1/0.3, erase value 0;
  * bad-frame skip list: the reference drops hardcoded KITTI frame-id ranges
    at load time (kitti_dataset.py:126-139); here the ranges are a dataset
    parameter with the reference's values as the documented default;
  * SingleDataset semantics for inference (label only, 1248-wide crops at
    aspect 3.25, start_frame_id skip — single_dataset.py:23-40).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
from PIL import Image

# The reference's hardcoded bad-frame id ranges for its KITTI sequence
# (SPADE/data/kitti_dataset.py:126-139): inclusive [lo, hi] pairs.
KITTI_BAD_FRAME_RANGES: tuple[tuple[int, int], ...] = (
    (0, 56), (69, 134), (840, 1306), (1674, 1705),
)


def _frame_id(name: str) -> int | None:
    try:
        return int(name.split(".")[0])
    except ValueError:
        return None


def in_skip_ranges(name: str, ranges) -> bool:
    fid = _frame_id(name)
    if fid is None:
        return False
    return any(lo <= fid <= hi for lo, hi in ranges)


def random_erasing(
    img: np.ndarray,
    rng: np.random.Generator,
    p: float = 0.8,
    sl: float = 0.02,
    sh: float = 0.3,
    r1: float = 0.2,
    value: float = 0.0,
) -> np.ndarray:
    """Cutout augmentation (SPADE/util/random_erasing.py:27, defaults p=0.8,
    sl=0.02, sh=0.3, r1=0.2; erase value 0 per base_dataset.py:83-84)."""
    if rng.random() > p:
        return img
    H, W = img.shape[:2]
    area = H * W
    for _ in range(100):
        target = rng.uniform(sl, sh) * area
        ratio = rng.uniform(r1, 1.0 / r1)
        h = int(round(np.sqrt(target * ratio)))
        w = int(round(np.sqrt(target / ratio)))
        if h < H and w < W:
            y = rng.integers(0, H - h)
            x = rng.integers(0, W - w)
            img = img.copy()
            img[y : y + h, x : x + w] = value
            return img
    return img


@dataclass
class PairedRenderDataset:
    """Yields (label, image) float32 NHWC batches in [-1, 1]."""

    label_dir: str
    image_dir: str
    crop_size: int = 256
    load_size: int = 286
    flip: bool = True
    erase: bool = True
    seed: int = 0
    # inclusive [lo, hi] frame-id ranges to drop; pass
    # KITTI_BAD_FRAME_RANGES for the reference's hardcoded skip list
    skip_ranges: tuple[tuple[int, int], ...] = ()

    def __post_init__(self):
        labels = sorted(os.listdir(self.label_dir))
        images = set(os.listdir(self.image_dir))
        self.names = [
            n for n in labels
            if n in images and not in_skip_ranges(n, self.skip_ranges)
        ]
        if not self.names:
            raise ValueError("no paired files between label and image dirs")
        self.rng = np.random.default_rng(self.seed)

    def __len__(self) -> int:
        return len(self.names)

    def _load_pair(self, name: str) -> tuple[np.ndarray, np.ndarray]:
        lab = Image.open(os.path.join(self.label_dir, name)).convert("RGB")
        img = Image.open(os.path.join(self.image_dir, name)).convert("RGB")
        # resize shorter side to load_size keeping aspect
        w, h = lab.size
        scale = self.load_size / min(w, h)
        nw, nh = int(round(w * scale)), int(round(h * scale))
        lab = lab.resize((nw, nh), Image.NEAREST)
        img = img.resize((nw, nh), Image.BICUBIC)
        return np.asarray(lab), np.asarray(img)

    def sample(self) -> tuple[np.ndarray, np.ndarray]:
        name = self.names[self.rng.integers(0, len(self.names))]
        lab, img = self._load_pair(name)
        H, W = lab.shape[:2]
        cs = self.crop_size
        y = self.rng.integers(0, max(H - cs, 0) + 1)
        x = self.rng.integers(0, max(W - cs, 0) + 1)
        lab = lab[y : y + cs, x : x + cs]
        img = img[y : y + cs, x : x + cs]
        if self.flip and self.rng.random() < 0.5:
            lab = lab[:, ::-1]
            img = img[:, ::-1]
        if self.erase:
            lab = random_erasing(lab, self.rng)
        to_f = lambda a: a.astype(np.float32) / 127.5 - 1.0
        return to_f(lab), to_f(img)

    def batches(self, batch_size: int, steps: int):
        for _ in range(steps):
            labs, imgs = zip(*(self.sample() for _ in range(batch_size)))
            yield np.stack(labs), np.stack(imgs)


@dataclass
class SingleRenderDataset:
    """Inference dataset: rendered labels only, deterministic order
    (reference SingleDataset, SPADE/data/single_dataset.py:23-40 — KITTI
    defaults crop_size=1248, aspect_ratio=3.25, i.e. 1248x384 center-crops,
    frames before ``start_frame_id`` skipped)."""

    label_dir: str
    crop_size: int = 1248
    aspect_ratio: float = 3.25
    start_frame_id: int = 0

    def __post_init__(self):
        names = sorted(os.listdir(self.label_dir))
        self.names = [
            n for n in names
            if (_frame_id(n) is None or _frame_id(n) >= self.start_frame_id)
        ]
        self.out_h = int(round(self.crop_size / self.aspect_ratio))

    def __len__(self) -> int:
        return len(self.names)

    def __iter__(self):
        for name in self.names:
            yield name, self.load(name)

    def load(self, name: str) -> np.ndarray:
        """float32 HWC label in [-1, 1], resized/cropped to
        (crop_size/aspect, crop_size)."""
        lab = Image.open(os.path.join(self.label_dir, name)).convert("RGB")
        w, h = lab.size
        cw, ch = self.crop_size, self.out_h
        scale = max(cw / w, ch / h)
        nw, nh = int(round(w * scale)), int(round(h * scale))
        lab = lab.resize((nw, nh), Image.NEAREST)
        x = (nw - cw) // 2
        y = (nh - ch) // 2
        arr = np.asarray(lab)[y : y + ch, x : x + cw]
        return arr.astype(np.float32) / 127.5 - 1.0


def postprocess_composite(
    rendered: np.ndarray, generated: np.ndarray, semantic: np.ndarray
) -> np.ndarray:
    """Final composite: where the rendered semantic is 0 (hole/sky) take the
    GAN pixel, else keep the rendered pixel (SPADE/postprocess.py:44-57)."""
    hole = semantic == 0
    out = rendered.copy()
    out[hole] = generated[hole]
    return out
