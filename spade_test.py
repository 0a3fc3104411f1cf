#!/usr/bin/env python
"""SPADE inference + postprocess CLI (reference SPADE/test.py +
postprocess.py parity).

    python spade_test.py --ckpt spade_ckpt.msgpack --label-dir renders/image \
        --semantic-dir renders/semantic --out out/ [--crop 256]

Runs the generator over rendered label images and composites GAN pixels into
render holes (where semantic == 0), writing the final simulator frames.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--label-dir", required=True)
    ap.add_argument("--semantic-dir", default=None)
    ap.add_argument("--out", default="output/enhanced")
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--ngf", type=int, default=64)
    ap.add_argument("--num-d", type=int, default=2)
    ap.add_argument("--n-layers-d", type=int, default=4)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--start-frame-id", type=int, default=0,
                    help="skip frames below this id (reference "
                         "single_dataset.py start_frame_id)")
    ap.add_argument("--use-vae", action="store_true",
                    help="checkpoint was trained with --use-vae (the "
                         "encoder rides in g_params; inference uses the "
                         "z = 0 prior unless --style-dir is given)")
    ap.add_argument("--style-dir", default=None,
                    help="with --use-vae: encode the same-named image from "
                         "this directory as the style source (mu path)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np
    from flax import serialization
    from PIL import Image

    from surfelmapping_tpu.models.data import postprocess_composite
    from surfelmapping_tpu.models.pix2pix import SpadeConfig, SpadeTrainer

    # run the generator at the labels' native width (the reference tests a
    # 256-trained model at 1248x384 the same way — the net is fully conv;
    # single_dataset.py:23-40).  Output dims snap to the net's 2^5 grid and
    # the fake is resized back to the label size for compositing.
    cfg = SpadeConfig(ngf=args.ngf, crop_size=args.crop, use_vgg=False,
                      num_d=args.num_d, n_layers_d=args.n_layers_d,
                      use_vae=args.use_vae)
    trainer = SpadeTrainer(cfg)

    from surfelmapping_tpu.models.data import _frame_id

    names = sorted(os.listdir(args.label_dir))
    names = [
        n for n in names
        if (_frame_id(n) is None or _frame_id(n) >= args.start_frame_id)
    ]
    if args.limit:
        names = names[: args.limit]
    first = np.asarray(
        Image.open(os.path.join(args.label_dir, names[0])).convert("RGB")
    )
    H, W = first.shape[:2]
    import dataclasses as _dc

    lab0 = jnp.zeros((1, H, W, 3), jnp.float32)
    state = trainer.init_state(lab0, lab0)
    with open(args.ckpt, "rb") as f:
        restored = serialization.from_bytes(_dc.asdict(state), f.read())
    state = type(state)(**restored)

    os.makedirs(args.out, exist_ok=True)
    for name in names:
        lab_u8 = np.asarray(
            Image.open(os.path.join(args.label_dir, name)).convert("RGB")
        )
        lab = jnp.asarray(lab_u8, jnp.float32)[None] / 127.5 - 1.0
        style = None
        if args.style_dir:
            sty_u8 = np.asarray(
                Image.open(os.path.join(args.style_dir, name)).convert("RGB")
            )
            style = jnp.asarray(sty_u8, jnp.float32)[None] / 127.5 - 1.0
        fake = np.asarray(trainer.infer(state, lab, style))[0]
        fake_u8 = np.clip((fake + 1.0) * 127.5, 0, 255).astype(np.uint8)
        if fake_u8.shape[:2] != lab_u8.shape[:2]:
            fake_u8 = np.asarray(
                Image.fromarray(fake_u8).resize(
                    (lab_u8.shape[1], lab_u8.shape[0]), Image.BICUBIC
                )
            )
        if args.semantic_dir:
            sem = np.asarray(
                Image.open(os.path.join(args.semantic_dir, name)).convert("L")
            )
            out = postprocess_composite(lab_u8, fake_u8, sem)
        else:
            out = fake_u8
        Image.fromarray(out).save(os.path.join(args.out, name))
    print(f"wrote {len(names)} frames to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
