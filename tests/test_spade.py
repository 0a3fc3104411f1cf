"""SPADE GAN smoke tests at tiny sizes: shapes, one G step + one D step
decrease nothing structurally (finite losses, params update), inference
range, random-erasing + postprocess semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from surfelmapping_tpu.models.data import postprocess_composite, random_erasing
from surfelmapping_tpu.models.pix2pix import SpadeConfig, SpadeTrainer


@pytest.fixture(scope="module")
def tiny_trainer():
    cfg = SpadeConfig(
        ngf=8, ndf=8, crop_size=64, use_vgg=False, num_d=2, n_layers_d=2
    )
    tr = SpadeTrainer(cfg, seed=0)
    label = jnp.zeros((2, 64, 64, 3), jnp.float32)
    image = jnp.zeros((2, 64, 64, 3), jnp.float32)
    state = tr.init_state(label, image)
    return tr, state


def test_generator_output_shape_and_range(tiny_trainer):
    tr, state = tiny_trainer
    label = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 64, 64, 3)),
                        jnp.float32)
    fake = tr.infer(state, label)
    assert fake.shape == (2, 64, 64, 3)
    assert float(jnp.abs(fake).max()) <= 1.0  # tanh head


def test_g_and_d_steps_update_params(tiny_trainer):
    tr, state = tiny_trainer
    rng = np.random.default_rng(1)
    label = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    real = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)

    state2, dlogs = tr.d_step(state, label, real)
    assert np.isfinite(float(dlogs["d_total"]))
    state3, glogs = tr.g_step(state2, label, real)
    for k in ("g_gan", "g_fm", "g_total"):
        assert np.isfinite(float(glogs[k])), k

    # parameters actually moved
    def l2diff(a, b):
        return sum(
            float(jnp.abs(x - y).sum())
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    assert l2diff(state.d_params, state2.d_params) > 0
    assert l2diff(state2.g_params, state3.g_params) > 0


def test_vae_mode_trains_and_infers():
    """use_vae wiring (reference pix2pix_model.py:62-67,135-150): the
    encoder's (mu, logvar) reparameterises z for the generator, the KLD term
    joins the G loss, and inference works both with a style image (mu path)
    and without one (z = 0)."""
    cfg = SpadeConfig(
        ngf=8, ndf=8, crop_size=64, use_vgg=False, num_d=1, n_layers_d=2,
        use_vae=True, z_dim=16,
    )
    tr = SpadeTrainer(cfg, seed=0)
    rng = np.random.default_rng(3)
    label = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    real = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    state = tr.init_state(label, real)
    assert "enc" in state.g_params  # encoder trains with G (G_params += E)

    state, dlogs = tr.d_step(state, label, real)
    assert np.isfinite(float(dlogs["d_total"]))
    state2, glogs = tr.g_step(state, label, real)
    assert "g_kld" in glogs and np.isfinite(float(glogs["g_kld"]))
    # the encoder received gradients through z and the KLD term
    diff = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(
            jax.tree.leaves(state.g_params["enc"]),
            jax.tree.leaves(state2.g_params["enc"]),
        )
    )
    assert diff > 0

    styled = tr.infer(state2, label, real)     # encode real -> mu
    unstyled = tr.infer(state2, label)          # z = 0 fallback
    assert styled.shape == unstyled.shape == (2, 64, 64, 3)
    assert float(jnp.abs(styled - unstyled).max()) > 0  # z actually matters


def test_random_erasing_zeroes_a_region():
    rng = np.random.default_rng(0)
    img = np.ones((64, 64, 3), np.float32)
    out = random_erasing(img, rng, p=1.0)
    assert (out == 0).any()
    assert (img == 1).all()  # input untouched


def test_postprocess_composites_holes():
    rendered = np.full((4, 4, 3), 10, np.uint8)
    generated = np.full((4, 4, 3), 200, np.uint8)
    semantic = np.zeros((4, 4), np.int32)
    semantic[2:, :] = 5
    out = postprocess_composite(rendered, generated, semantic)
    assert (out[:2] == 200).all()  # holes filled from GAN
    assert (out[2:] == 10).all()   # rendered kept


def test_linear_lr_decay_schedule(tiny_trainer):
    """Reference decay (pix2pix_trainer.py:66-86): constant through epoch
    niter, then linear to zero at niter+niter_decay; TTUR split G lr/2,
    D lr*2 maintained throughout."""
    cfg = SpadeConfig(
        ngf=8, ndf=8, crop_size=64, use_vgg=False, num_d=1, n_layers_d=2,
        lr=2e-4, niter=3, niter_decay=4,
    )
    tr = SpadeTrainer(cfg, seed=0)
    label = jnp.zeros((1, 64, 64, 3), jnp.float32)
    state = tr.init_state(label, label)

    lrs = []
    for epoch in range(1, cfg.niter + cfg.niter_decay + 1):
        state = tr.update_learning_rate(state, epoch + 1)
        lrs.append(tr.current_lrs(state))
    g_lrs = [g for g, _ in lrs]
    d_lrs = [d for _, d in lrs]
    # constant until niter (updates for epochs 2..niter keep base lr)
    np.testing.assert_allclose(g_lrs[: cfg.niter - 1], cfg.lr / 2, rtol=1e-6)
    # linear decay afterwards, clamped at zero (the extra final update is a
    # no-op)
    expect = [
        cfg.lr * max(0.0, 1 - (i + 1) / cfg.niter_decay)
        for i in range(len(g_lrs) - (cfg.niter - 1))
    ]
    np.testing.assert_allclose(g_lrs[cfg.niter - 1 :], [e / 2 for e in expect], atol=1e-10)
    np.testing.assert_allclose(d_lrs[cfg.niter - 1 :], [e * 2 for e in expect], atol=1e-10)
    assert abs(g_lrs[-1]) < 1e-12


def test_data_parallel_sharded_jit_matches_single_device():
    """The DataParallel+SyncBN analogue: sharding the batch over an 8-device
    mesh and jitting must produce the same step as one device (global batch
    stats under jit ARE sync-BN).

    Runs in a SUBPROCESS (tests/spade_dp_worker.py): issuing this large
    sharded compile after ~55 other tests' compilations segfaults the XLA
    CPU compiler in-process (accumulated-state bug in this jax build; the
    identical code passes standalone), so it gets its own process like the
    multi-host test."""
    import os
    import subprocess
    import sys

    worker = os.path.join(os.path.dirname(__file__), "spade_dp_worker.py")
    r = subprocess.run(
        [sys.executable, worker], capture_output=True, text=True, timeout=900
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "OK maxdiff=" in r.stdout


def test_vgg19_npz_weight_loading(tmp_path):
    """load_vgg19_weights restores an npz checkpoint into params usable by
    VGG19Features.apply (the pretrained-loss path, ref loss.py:15)."""
    from surfelmapping_tpu.models.losses import VGG19Features, load_vgg19_weights

    vgg = VGG19Features()
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = vgg.init(jax.random.PRNGKey(0), x)

    path = tmp_path / "vgg19.npz"
    flat = {}
    for i in range(16):
        p = params["params"][f"conv{i}"]
        flat[f"conv{i}_kernel"] = np.asarray(p["kernel"])
        flat[f"conv{i}_bias"] = np.asarray(p["bias"])
    np.savez(path, **flat)

    loaded = load_vgg19_weights(str(path))
    assert loaded is not None
    feats_a = vgg.apply(params, x)
    feats_b = vgg.apply(loaded, x)
    for a, b in zip(feats_a, feats_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert load_vgg19_weights(str(tmp_path / "missing.pth")) is None


def test_single_render_dataset_and_skip_list(tmp_path):
    from PIL import Image

    from surfelmapping_tpu.models.data import (
        PairedRenderDataset,
        SingleRenderDataset,
        in_skip_ranges,
    )

    lab_dir = tmp_path / "label"
    img_dir = tmp_path / "image"
    lab_dir.mkdir()
    img_dir.mkdir()
    for fid in (10, 60, 70, 200):
        arr = Image.fromarray(np.full((40, 130, 3), fid, np.uint8))
        arr.save(lab_dir / f"{fid:06d}.png")
        arr.save(img_dir / f"{fid:06d}.png")

    ranges = ((0, 56), (69, 134))
    assert in_skip_ranges("000010.png", ranges)
    assert not in_skip_ranges("000060.png", ranges)

    ds = PairedRenderDataset(
        str(lab_dir), str(img_dir), crop_size=32, load_size=36,
        skip_ranges=ranges,
    )
    assert sorted(ds.names) == ["000060.png", "000200.png"]

    sd = SingleRenderDataset(
        str(lab_dir), crop_size=130, aspect_ratio=3.25, start_frame_id=65
    )
    assert sorted(sd.names) == ["000070.png", "000200.png"]
    name, arr = next(iter(sd))
    assert arr.shape == (40, 130, 3)
    assert arr.dtype == np.float32


def test_spade_train_cli_smoke(tmp_path):
    """End-to-end train CLI: 2 epochs x 2 steps at tiny sizes exercises the
    epoch loop, LR decay, iter.txt bookkeeping, checkpointing, loss log and
    resume (--continue-train)."""
    import os

    from PIL import Image

    import spade_train

    lab_dir = tmp_path / "label"
    img_dir = tmp_path / "image"
    lab_dir.mkdir(); img_dir.mkdir()
    rng = np.random.default_rng(0)
    for fid in range(3):
        arr = rng.integers(0, 255, (40, 48, 3)).astype(np.uint8)
        Image.fromarray(arr).save(lab_dir / f"{fid:06d}.png")
        Image.fromarray(arr[::-1]).save(img_dir / f"{fid:06d}.png")

    ckpt = tmp_path / "ckpt"
    argv = [
        "--label-dir", str(lab_dir), "--image-dir", str(img_dir),
        "--niter", "1", "--niter-decay", "1", "--steps-per-epoch", "2",
        "--crop", "32", "--ngf", "8", "--ndf", "8",
        "--num-d", "1", "--n-layers-d", "2", "--no-vgg",
        "--ckpt-dir", str(ckpt), "--log-every", "1", "--display-every", "1000",
    ]
    assert spade_train.main(argv) == 0
    assert (ckpt / "latest.msgpack").exists()
    assert (ckpt / "iter.txt").exists()
    assert (ckpt / "opt.pkl").exists()
    log = (ckpt / "loss_log.txt").read_text()
    assert "d_total" in log
    # resume: runs the remaining epochs from the recorded cursor
    assert spade_train.main(argv + ["--continue-train"]) == 0

    # inference + postprocess over the trained checkpoint (spade_test CLI)
    import spade_test

    out_dir = tmp_path / "enhanced"
    assert spade_test.main([
        "--ckpt", str(ckpt / "latest.msgpack"),
        "--label-dir", str(lab_dir), "--semantic-dir", str(lab_dir),
        "--out", str(out_dir), "--ngf", "8",
        "--num-d", "1", "--n-layers-d", "2", "--limit", "1",
        "--start-frame-id", "1",
    ]) == 0
    outs = sorted(os.listdir(out_dir))
    assert outs == ["000001.png"]  # start-frame-id skipped 000000
