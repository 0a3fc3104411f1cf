"""End-to-end simulator data-flow chain (SURVEY section 3.5 / VERDICT r4 #9).

Drives the ENTIRE product pipeline through the real CLIs, asserting
artifact counts/formats at every hop:

  build_map (synthetic, save reference-format map)
    -> load_map --mode paired / random / s / overview  (render PNG pairs)
    -> spade_train (tiny GAN, a few steps, on paired render vs captured)
    -> spade_test (enhance the novel renders, postprocess composite)
    -> move_data (renumber into the final dataset layout)

Writes E2E_r05.json with the per-hop inventory.  Runs on whatever backend
is active (TPU in production; CPU works too, slower).

Usage: python tools/run_e2e.py [--workdir DIR] [--frames 6]
"""
import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def count_pngs(d):
    if not os.path.isdir(d):
        return -1
    return len([f for f in os.listdir(d) if f.endswith(".png")])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--out", default="E2E_r05.json")
    args = ap.parse_args()

    wd = args.workdir or tempfile.mkdtemp(prefix="smtpu_e2e_")
    os.makedirs(wd, exist_ok=True)
    doc = {"workdir": wd, "hops": {}}
    F = args.frames

    import numpy as np
    from PIL import Image

    import build_map
    import load_map
    import move_data
    import spade_test
    import spade_train

    # ---- hop 1: build + save the map ------------------------------------
    map_path = os.path.join(wd, "map.bin")
    rc = build_map.main([
        "--synthetic", str(F), "--out", map_path,
        "--capacity", str(1 << 20), "--fuse-thresh", "0.05",
    ])
    assert rc == 0 and os.path.exists(map_path), "build_map failed"
    import struct

    with open(map_path, "rb") as f:
        n_surfels, start_id, end_id = struct.unpack("<Iii", f.read(12))
    assert n_surfels > 50_000, f"implausibly small map: {n_surfels}"
    doc["hops"]["build_map"] = {
        "surfels": n_surfels, "start_id": start_id, "end_id": end_id,
        "bytes": os.path.getsize(map_path),
    }

    # ---- hop 2: the four load_map simulation paths ----------------------
    expected = {}
    for mode in ("paired", "random", "s", "overview"):
        out_dir = os.path.join(wd, f"novel_{mode}")
        rc = load_map.main([
            map_path, "--synthetic", "--mode", mode, "--num", "3",
            "--out", out_dir, "--footprint", "4",
        ])
        assert rc == 0, f"load_map --mode {mode} failed"
        actual_dir = (
            out_dir.replace("novel", "paired") if mode == "paired"
            else out_dir.replace("novel", "overview") if mode == "overview"
            else out_dir
        )
        n_img = count_pngs(os.path.join(actual_dir, "image"))
        n_sem = count_pngs(os.path.join(actual_dir, "semantic"))
        assert n_img == n_sem and n_img > 0, f"{mode}: {n_img} vs {n_sem}"
        # format checks: RGB u8 image; semantic u8 with 0 = hole
        name = sorted(os.listdir(os.path.join(actual_dir, "image")))[0]
        im = np.asarray(Image.open(os.path.join(actual_dir, "image", name)))
        sm = np.asarray(Image.open(os.path.join(actual_dir, "semantic", name)))
        assert im.ndim == 3 and im.shape[2] == 3 and im.dtype == np.uint8
        assert sm.ndim == 2 and sm.max() >= 1, "semantic all holes"
        expected[mode] = actual_dir
        doc["hops"][f"load_map_{mode}"] = {
            "pairs": n_img, "dir": actual_dir,
            "image_nonzero_frac": round(float((im > 0).any(-1).mean()), 3),
        }

    # ---- hop 3: captured 'real' images for GAN training ------------------
    from surfelmapping_tpu.io.synthetic import SyntheticScene, kitti_cam

    real_dir = os.path.join(wd, "captured", "image")
    os.makedirs(real_dir, exist_ok=True)
    scene = SyntheticScene(kitti_cam())
    for i in range(F):
        rgb = scene.frame(i)[0]
        Image.fromarray(np.asarray(rgb, np.uint8)).save(
            os.path.join(real_dir, f"{i:06d}.png")
        )

    # ---- hop 4: SPADE training on (rendered label, captured real) -------
    ckpt = os.path.join(wd, "ckpt")
    rc = spade_train.main([
        "--label-dir", os.path.join(expected["paired"], "image"),
        "--image-dir", real_dir,
        "--niter", "1", "--niter-decay", "0", "--steps-per-epoch", "2",
        "--crop", "32", "--ngf", "8", "--ndf", "8",
        "--num-d", "1", "--n-layers-d", "2", "--no-vgg",
        "--ckpt-dir", ckpt, "--log-every", "1", "--display-every", "1000",
    ])
    assert rc == 0 and os.path.exists(os.path.join(ckpt, "latest.msgpack"))
    doc["hops"]["spade_train"] = {
        "ckpt_files": sorted(os.listdir(ckpt))[:8],
    }

    # ---- hop 5: enhancement of the novel renders ------------------------
    enhanced = os.path.join(wd, "enhanced")
    rc = spade_test.main([
        "--ckpt", os.path.join(ckpt, "latest.msgpack"),
        "--label-dir", os.path.join(expected["random"], "image"),
        "--semantic-dir", os.path.join(expected["random"], "semantic"),
        "--out", enhanced, "--ngf", "8",
        "--num-d", "1", "--n-layers-d", "2",
    ])
    assert rc == 0
    n_enh = count_pngs(enhanced)
    assert n_enh == count_pngs(os.path.join(expected["random"], "image"))
    doc["hops"]["spade_test"] = {"enhanced": n_enh}

    # ---- hop 6: renumber into the final dataset -------------------------
    final = os.path.join(wd, "dataset")
    rc = move_data.main([
        "--offset", str(1000), "-t", final, "-s", expected["random"],
    ])
    assert rc == 0
    names = sorted(os.listdir(os.path.join(final, "image")))
    assert names[0] == "001000.png", names[:2]
    doc["hops"]["move_data"] = {"moved": len(names), "first": names[0]}

    doc["ok"] = True
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))
    if args.workdir is None:
        shutil.rmtree(wd, ignore_errors=True)


if __name__ == "__main__":
    main()
