#!/usr/bin/env python
"""SPADE GAN training CLI (reference SPADE/train.py parity).

    python spade_train.py --label-dir D1 --image-dir D2
        [--niter 100 --niter-decay 100] [--batch B] [--crop 256]
        [--d-steps-per-g 2] [--ckpt-dir checkpoints/spade]
        [--continue-train] [--steps-per-epoch N]

Reference schedule (SPADE/train.py:38-82 + trainers/pix2pix_trainer.py):
epoch loop over niter + niter_decay epochs, a G step every
``--d-steps-per-g`` iterations, a D step every iteration, TTUR Adam,
hinge + FM (+ VGG) losses, linear LR decay after ``--niter`` epochs,
iter.txt-resumable iteration bookkeeping, loss log + HTML gallery.

Data parallelism: with more than one device a (data,) mesh is built, batches
are sharded over it and parameters replicated — under jit the BatchNorm
statistics and gradients are computed over the GLOBAL batch (this is the
sync-BN + DataParallel semantics of the reference in one sharding
annotation).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--label-dir", required=True)
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--niter", type=int, default=100,
                    help="epochs at constant lr")
    ap.add_argument("--niter-decay", type=int, default=100,
                    help="epochs of linear lr decay to zero")
    ap.add_argument("--steps-per-epoch", type=int, default=0,
                    help="batches per epoch (0 = dataset size / batch)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--ngf", type=int, default=64)
    ap.add_argument("--ndf", type=int, default=64)
    ap.add_argument("--d-steps-per-g", type=int, default=2)
    ap.add_argument("--num-d", type=int, default=2,
                    help="multiscale discriminator count")
    ap.add_argument("--n-layers-d", type=int, default=4)
    ap.add_argument("--no-vgg", action="store_true")
    ap.add_argument("--use-vae", action="store_true",
                    help="VAE mode: ConvEncoder + reparameterised z + KLD "
                         "loss (reference --use_vae)")
    ap.add_argument("--lambda-kld", type=float, default=0.05)
    ap.add_argument("--kitti-skip-list", action="store_true",
                    help="drop the reference's hardcoded bad KITTI frames")
    ap.add_argument("--ckpt-dir", default="checkpoints/spade")
    ap.add_argument("--continue-train", action="store_true")
    ap.add_argument("--log-every", type=int, default=20)
    ap.add_argument("--display-every", type=int, default=200)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from surfelmapping_tpu.models.data import (
        KITTI_BAD_FRAME_RANGES,
        PairedRenderDataset,
    )
    from surfelmapping_tpu.models.pix2pix import (
        SpadeConfig,
        SpadeTrainer,
        shard_batch,
    )
    from surfelmapping_tpu.models.train_utils import (
        IterationCounter,
        Visualizer,
        save_options,
        to_uint8_image,
    )

    os.makedirs(args.ckpt_dir, exist_ok=True)
    save_options(args.ckpt_dir, args)

    devices = jax.devices()
    n_dev = len(devices)
    mesh = None
    if n_dev > 1 and args.batch % n_dev == 0:
        mesh = Mesh(np.asarray(devices), ("data",))
    elif n_dev > 1:
        print(
            f"--batch {args.batch} not divisible by {n_dev} devices; "
            "running single-device (pad the batch to shard)"
        )

    cfg = SpadeConfig(
        ngf=args.ngf, ndf=args.ndf, crop_size=args.crop,
        use_vgg=not args.no_vgg,
        num_d=args.num_d, n_layers_d=args.n_layers_d,
        niter=args.niter, niter_decay=args.niter_decay,
        use_vae=args.use_vae, lambda_kld=args.lambda_kld,
    )
    trainer = SpadeTrainer(cfg)
    ds = PairedRenderDataset(
        args.label_dir, args.image_dir, crop_size=args.crop,
        load_size=int(args.crop * 1.12),
        skip_ranges=KITTI_BAD_FRAME_RANGES if args.kitti_skip_list else (),
    )
    print(f"{len(ds)} paired frames; devices={n_dev}")

    lab0, img0 = next(ds.batches(args.batch, 1))
    state = trainer.init_state(jnp.asarray(lab0), jnp.asarray(img0))

    import dataclasses as _dc

    ckpt_path = os.path.join(args.ckpt_dir, "latest.msgpack")
    if args.continue_train and os.path.exists(ckpt_path):
        with open(ckpt_path, "rb") as f:
            restored = serialization.from_bytes(_dc.asdict(state), f.read())
        state = type(state)(**restored)
        print(f"restored checkpoint {ckpt_path}")

    if mesh is not None:
        # replicate params/opt state; batches shard over the data axis
        rep = NamedSharding(mesh, P())
        state = jax.device_put(state, rep)

    steps_per_epoch = args.steps_per_epoch or max(len(ds) // args.batch, 1)
    counter = IterationCounter(
        args.ckpt_dir, steps_per_epoch * args.batch, args.batch,
        args.niter, args.niter_decay, continue_train=args.continue_train,
    )
    viz = Visualizer(args.ckpt_dir)

    def save(state):
        with open(ckpt_path, "wb") as f:
            f.write(
                serialization.to_bytes(jax.device_get(_dc.asdict(state)))
            )
        counter.record_current_iter()

    # replay the decay schedule up to the resume epoch so a resumed run
    # continues at the correct lr (update runs at the END of each epoch
    # with that epoch's number — reference train.py:85 convention)
    for e in range(1, counter.first_epoch):
        state = trainer.update_learning_rate(state, e)

    for epoch in counter.training_epochs():
        counter.record_epoch_start(epoch)
        for i, (lab, img) in enumerate(
            ds.batches(args.batch, steps_per_epoch)
        ):
            lab, img = jnp.asarray(lab), jnp.asarray(img)
            if mesh is not None:
                lab, img = shard_batch(mesh, (lab, img))
            state, dlogs = trainer.d_step(state, lab, img)
            logs = dict(dlogs)
            if i % args.d_steps_per_g == 0:
                state, glogs = trainer.g_step(state, lab, img)
                logs.update(glogs)
            counter.record_one_iteration()
            if counter.needs_printing(args.log_every * args.batch):
                viz.print_current_errors(epoch, counter.epoch_iter, logs)
            if counter.needs_displaying(args.display_every * args.batch):
                fake = trainer.infer(state, lab)
                viz.display_current_results(
                    {
                        "input_label": np.asarray(lab[0]),
                        "synthesized_image": np.asarray(fake[0]),
                        "real_image": np.asarray(img[0]),
                    },
                    epoch, counter.total_steps_so_far,
                )
            if counter.needs_saving():
                save(state)
        counter.record_epoch_end()
        state = trainer.update_learning_rate(state, epoch)
        g_lr, d_lr = trainer.current_lrs(state)
        print(f"epoch {epoch} done; lr G={g_lr:.2e} D={d_lr:.2e}")
        save(state)
    return 0


if __name__ == "__main__":
    sys.exit(main())
