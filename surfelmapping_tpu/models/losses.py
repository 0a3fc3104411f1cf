"""GAN training losses (SPADE/models/networks/loss.py parity).

  * hinge GAN loss (the reference default, loss.py GANLoss 'hinge');
  * multiscale feature-matching L1 (pix2pix_model.py:151-160, lambda 10/num_D);
  * VGG19 perceptual loss with the reference's 1/32..1 layer weights
    (loss.py VGGLoss).  :func:`load_vgg19_weights` imports pretrained
    torchvision weights from a local ``vgg19*.pth`` / ``.npz`` checkpoint
    (path or SMTPU_VGG19 env var; zero-egress environments without a local
    checkpoint fall back to a fixed randomly-initialised feature net —
    random conv features still give a usable perceptual metric and keep the
    loss surface defined);
  * KL divergence for the optional VAE mode (loss.py KLDLoss).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


def hinge_d_loss(real_logits: jax.Array, fake_logits: jax.Array) -> jax.Array:
    return jnp.mean(nn.relu(1.0 - real_logits)) + jnp.mean(nn.relu(1.0 + fake_logits))


def hinge_g_loss(fake_logits: jax.Array) -> jax.Array:
    return -jnp.mean(fake_logits)


def multiscale_hinge_d(
    real_feats: Sequence[Sequence[jax.Array]],
    fake_feats: Sequence[Sequence[jax.Array]],
) -> jax.Array:
    """Mean hinge loss over the final logits of every scale (the reference
    divides by num_D, pix2pix_model.py GANLoss __call__)."""
    loss = 0.0
    for rf, ff in zip(real_feats, fake_feats):
        loss = loss + hinge_d_loss(rf[-1], ff[-1])
    return loss / len(real_feats)


def multiscale_hinge_g(fake_feats: Sequence[Sequence[jax.Array]]) -> jax.Array:
    loss = 0.0
    for ff in fake_feats:
        loss = loss + hinge_g_loss(ff[-1])
    return loss / len(fake_feats)


def feature_matching_loss(
    real_feats: Sequence[Sequence[jax.Array]],
    fake_feats: Sequence[Sequence[jax.Array]],
    lambda_feat: float = 10.0,
) -> jax.Array:
    """L1 between D intermediate features of fake and (stop-grad) real
    (pix2pix_model.py:151-160)."""
    num_d = len(real_feats)
    loss = 0.0
    for rf, ff in zip(real_feats, fake_feats):
        for r, f in zip(rf[:-1], ff[:-1]):
            loss = loss + jnp.mean(jnp.abs(f - jax.lax.stop_gradient(r)))
    return loss * lambda_feat / num_d


class VGG19Features(nn.Module):
    """VGG19 conv slices matching SPADE/models/networks/architecture.py:94-124
    (relu1_1, relu2_1, relu3_1, relu4_1, relu5_1 outputs)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        cfg = [
            # (channels, convs in block)
            (64, 2), (128, 2), (256, 4), (512, 4), (512, 4),
        ]
        outs = []
        h = x
        li = 0
        for bi, (ch, n) in enumerate(cfg):
            for ci in range(n):
                h = nn.Conv(ch, (3, 3), padding=1, name=f"conv{li}")(h)
                h = nn.relu(h)
                li += 1
                if ci == 0:
                    outs.append(h)  # relu{bi+1}_1
            if bi < len(cfg) - 1:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        return outs


def load_vgg19_weights(path: str | None = None):
    """Flax params for :class:`VGG19Features` from a LOCAL pretrained
    checkpoint (the reference uses torchvision's pretrained VGG19,
    SPADE/models/networks/architecture.py:94-124 + loss.py:15).

    Accepts either a torch ``.pth`` state_dict (torchvision layout:
    ``features.{idx}.weight`` [out,in,kh,kw]) or an ``.npz`` with keys
    ``conv{i}_kernel`` / ``conv{i}_bias`` already in flax layout
    [kh,kw,in,out].  ``path=None`` reads the SMTPU_VGG19 env var.  Returns
    None when no checkpoint is available (callers fall back to random init).
    """
    import os

    path = path or os.environ.get("SMTPU_VGG19")
    if not path or not os.path.exists(path):
        return None
    if path.endswith(".npz"):
        import numpy as np

        data = np.load(path)
        params = {
            f"conv{i}": {
                "kernel": jnp.asarray(data[f"conv{i}_kernel"]),
                "bias": jnp.asarray(data[f"conv{i}_bias"]),
            }
            for i in range(16)
        }
        return {"params": params}
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    # torchvision vgg19.features conv layer indices, in order
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
    params = {}
    for i, li in enumerate(conv_idx):
        w = sd[f"features.{li}.weight"].numpy()  # [out,in,kh,kw]
        b = sd[f"features.{li}.bias"].numpy()
        params[f"conv{i}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),  # [kh,kw,in,out]
            "bias": jnp.asarray(b),
        }
    return {"params": params}


VGG_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)
_IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
_IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def vgg_loss(
    vgg_apply, vgg_params, fake: jax.Array, real: jax.Array, lambda_vgg: float = 10.0
) -> jax.Array:
    """Perceptual L1 over VGG slices; images in [-1, 1] (tanh range)."""

    def prep(img):
        img = (img + 1.0) / 2.0
        return (img - _IMAGENET_MEAN) / _IMAGENET_STD

    f_feats = vgg_apply(vgg_params, prep(fake))
    r_feats = vgg_apply(vgg_params, prep(jax.lax.stop_gradient(real)))
    loss = 0.0
    for w, f, r in zip(VGG_WEIGHTS, f_feats, r_feats):
        loss = loss + w * jnp.mean(jnp.abs(f - jax.lax.stop_gradient(r)))
    return loss * lambda_vgg


def kld_loss(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    return -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar))
