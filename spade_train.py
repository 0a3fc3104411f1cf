#!/usr/bin/env python
"""SPADE GAN training CLI (reference SPADE/train.py parity).

    python spade_train.py --label-dir D1 --image-dir D2 [--steps N]
        [--batch B] [--crop 256] [--d-steps-per-g 2] [--out ckpt.msgpack]

Trains the flax SPADE generator/discriminator on paired
(rendered label, real image) data with the reference schedule: a G step every
``--d-steps-per-g`` iterations, a D step every iteration (SPADE/train.py:49-53),
TTUR Adam, hinge + FM (+ VGG) losses.  Data parallelism: run under a multi-
device runtime and batches shard over the 'data' mesh axis automatically.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--label-dir", required=True)
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--ngf", type=int, default=64)
    ap.add_argument("--ndf", type=int, default=64)
    ap.add_argument("--d-steps-per-g", type=int, default=2)
    ap.add_argument("--no-vgg", action="store_true")
    ap.add_argument("--out", default="spade_ckpt.msgpack")
    ap.add_argument("--log-every", type=int, default=20)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    from surfelmapping_tpu.models.data import PairedRenderDataset
    from surfelmapping_tpu.models.pix2pix import SpadeConfig, SpadeTrainer

    n_dev = len(jax.devices())
    axis = "data" if n_dev > 1 else None
    cfg = SpadeConfig(
        ngf=args.ngf, ndf=args.ndf, crop_size=args.crop,
        use_vgg=not args.no_vgg, axis_name=None,  # BN sync via sharded jit
    )
    trainer = SpadeTrainer(cfg)
    ds = PairedRenderDataset(
        args.label_dir, args.image_dir, crop_size=args.crop,
        load_size=int(args.crop * 1.12),
    )
    print(f"{len(ds)} paired frames; devices={n_dev}")

    lab0, img0 = next(ds.batches(args.batch, 1))
    state = trainer.init_state(jnp.asarray(lab0), jnp.asarray(img0))

    t0 = time.perf_counter()
    for i, (lab, img) in enumerate(ds.batches(args.batch, args.steps)):
        lab, img = jnp.asarray(lab), jnp.asarray(img)
        state, dlogs = trainer.d_step(state, lab, img)
        logs = dict(dlogs)
        if i % args.d_steps_per_g == 0:
            state, glogs = trainer.g_step(state, lab, img)
            logs.update(glogs)
        if i % args.log_every == 0:
            msg = " ".join(f"{k}={float(v):.3f}" for k, v in sorted(logs.items()))
            ips = (i + 1) / (time.perf_counter() - t0)
            print(f"step {i}: {msg} ({ips:.2f} it/s)", flush=True)

    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(state))
    print(f"saved checkpoint to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
