"""Dataset IO tests: KITTI-layout reader (calibration, poses with T20
baseline correction, 6-digit names, cursor semantics) and the native
libpng prefetcher round-trip."""

import os

import numpy as np
import pytest
from PIL import Image

from surfelmapping_tpu.io.kitti import KittiReader, T20


@pytest.fixture
def kitti_dir(tmp_path, rng):
    d = tmp_path / "seq"
    (d / "image_2").mkdir(parents=True)
    (d / "PSMNet").mkdir()
    (d / "semantics").mkdir()
    n, H, W = 4, 20, 32
    with open(d / "times.txt", "w") as f:
        f.writelines(f"{i * 0.1:.6f}\n" for i in range(n))
    with open(d / "calibration.txt", "w") as f:
        f.write("100.0 101.0 16.0 10.0\n32 20\n")
    with open(d / "pose.txt", "w") as f:
        for i in range(n):
            T = np.eye(4)
            T[2, 3] = i * 0.5
            f.write(" ".join(str(x) for x in T[:3].ravel()) + "\n")
    frames = []
    for i in range(n):
        rgb = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        dep = rng.integers(0, 60000, (H, W), dtype=np.uint16)
        sem = rng.integers(0, 19, (H, W), dtype=np.uint8)
        Image.fromarray(rgb).save(d / "image_2" / f"{i:06d}.png")
        Image.fromarray(dep).save(d / "PSMNet" / f"{i:06d}.png")
        Image.fromarray(sem).save(d / "semantics" / f"{i:06d}.png")
        frames.append((rgb, dep, sem))
    return str(d), frames


def test_kitti_reader_loads_frames(kitti_dir):
    path, frames = kitti_dir
    r = KittiReader(path)
    assert r.cam.fx == 100.0 and r.cam.width == 32 and r.cam.height == 20
    f0 = r.get_next()
    assert f0.frame_id == 0
    np.testing.assert_array_equal(f0.rgb, frames[0][0])
    np.testing.assert_array_equal(f0.depth, frames[0][1])
    np.testing.assert_array_equal(f0.semantic, frames[0][2])
    # gt pose carries the stereo-baseline correction
    expected = np.eye(4, dtype=np.float32) @ T20
    np.testing.assert_allclose(f0.pose, expected, atol=1e-6)
    f1 = r.get_next()
    assert f1.pose[2, 3] == pytest.approx(0.5)


def test_kitti_reader_cursor_semantics(kitti_dir):
    path, frames = kitti_dir
    r = KittiReader(path, use_native=False)
    ids = []
    while (f := r.get_next()) is not None:
        ids.append(f.frame_id)
    assert ids == [0, 1, 2, 3]
    r.save_state()
    back = []
    while (f := r.get_last()) is not None:
        back.append(f.frame_id)
    assert back == [2, 1, 0]
    r.resume_state()
    assert r.current == 3


def test_native_prefetcher_matches_pil(kitti_dir):
    from surfelmapping_tpu.io import native

    if not native.ensure_built():
        pytest.skip("no native toolchain")
    path, frames = kitti_dir
    pf = native.FramePrefetcher(
        os.path.join(path, "image_2"), os.path.join(path, "PSMNet"),
        os.path.join(path, "semantics"), 0, 3,
    )
    for i in range(4):
        rgb, dep, sem = pf.get(i)
        np.testing.assert_array_equal(rgb, frames[i][0])
        np.testing.assert_array_equal(dep, frames[i][1])
        np.testing.assert_array_equal(sem, frames[i][2])
    pf.close()


def test_native_map_io_roundtrip(tmp_path, rng):
    from surfelmapping_tpu.io import native

    if not native.ensure_built():
        pytest.skip("no native toolchain")
    rec = rng.normal(size=(64, 12)).astype(np.float32)
    p = str(tmp_path / "m.bin")
    native.save_map_native(p, rec, 1, 9)
    rec2, a, b = native.load_map_native(p)
    np.testing.assert_array_equal(rec, rec2)
    assert (a, b) == (1, 9)
    # interoperable with the python-side reader
    from surfelmapping_tpu.surfels import load_map

    smap, s0, s1 = load_map(p)
    assert (s0, s1) == (1, 9) and int(smap.count) == 64
