"""SPADE generator / multiscale discriminator / encoder in flax linen.

TPU-native re-implementation of the reference's modified SPADE
(SPADE/models/networks/{generator,discriminator,normalization,architecture,
encoder}.py).  Key behavioural facts preserved:

  * KITTI modification: the "label" IS the rendered surfel RGB image — the
    one-hot semantic encoding is bypassed entirely
    (SPADE/models/pix2pix_model.py:109-133), so label_nc = 3;
  * SPADE layer = param-free batch norm + label-conditioned (gamma, beta)
    from a shared 128-channel conv MLP (normalization.py:66-110);
  * generator: fc conv at 8x8-ish latent grid -> head + 2 middle + 4 up
    SPADEResnetBlocks with 2x nearest upsampling, tanh image head
    (generator.py:25-120);
  * discriminator: num_D=2 PatchGANs over concat(label, image), 4 layers,
    intermediate features returned for the FM loss (discriminator.py);
  * spectral norm on conv weights (normalization.py:16-50) via
    flax.linen.SpectralNorm.

The reference's cross-GPU SyncBN master/slave machinery
(SPADE/models/networks/sync_batchnorm/) collapses to BatchNorm with
``axis_name="data"`` — the batch statistics psum over the data mesh axis.

MXU notes: convs run in NHWC with channel counts that are multiples of 64;
parameters live in fp32, activations can be bf16 (set ``compute_dtype``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

LRELU_SLOPE = 0.2


def _sn(module: nn.Module) -> nn.Module:
    """Spectral-norm wrapper (reference get_nonspade_norm_layer 'spectral')."""
    return nn.SpectralNorm(module)


def _resize_nearest(x: jax.Array, h: int, w: int) -> jax.Array:
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method="nearest")


class SPADENorm(nn.Module):
    """SPADE: param-free sync-BN + label-conditioned modulation
    (normalization.py:66-110).  nhidden=128, 3x3 convs."""

    norm_nc: int
    axis_name: str | None = None
    nhidden: int = 128

    @nn.compact
    def __call__(self, x: jax.Array, segmap: jax.Array, train: bool) -> jax.Array:
        normalized = nn.BatchNorm(
            use_running_average=not train,
            use_bias=False,
            use_scale=False,
            axis_name=self.axis_name,
            momentum=0.9,
        )(x)
        seg = _resize_nearest(segmap, x.shape[1], x.shape[2])
        actv = nn.relu(nn.Conv(self.nhidden, (3, 3), padding=1)(seg))
        gamma = nn.Conv(self.norm_nc, (3, 3), padding=1)(actv)
        beta = nn.Conv(self.norm_nc, (3, 3), padding=1)(actv)
        return normalized * (1.0 + gamma) + beta


class SPADEResnetBlock(nn.Module):
    """architecture.py:21-70: spectral convs + SPADE norms + learned shortcut."""

    fin: int
    fout: int
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, seg: jax.Array, train: bool) -> jax.Array:
        fmiddle = min(self.fin, self.fout)
        learned_shortcut = self.fin != self.fout

        dx = SPADENorm(self.fin, self.axis_name, name="norm_0")(x, seg, train)
        dx = _sn(nn.Conv(fmiddle, (3, 3), padding=1, name="conv_0"))(
            nn.leaky_relu(dx, LRELU_SLOPE), update_stats=train
        )
        dx = SPADENorm(fmiddle, self.axis_name, name="norm_1")(dx, seg, train)
        dx = _sn(nn.Conv(self.fout, (3, 3), padding=1, name="conv_1"))(
            nn.leaky_relu(dx, LRELU_SLOPE), update_stats=train
        )
        if learned_shortcut:
            xs = SPADENorm(self.fin, self.axis_name, name="norm_s")(x, seg, train)
            xs = _sn(nn.Conv(self.fout, (1, 1), use_bias=False, name="conv_s"))(
                xs, update_stats=train
            )
        else:
            xs = x
        return xs + dx


class SPADEGenerator(nn.Module):
    """generator.py:25-120 ('normal' = 5 up layers, 7 SPADE blocks)."""

    ngf: int = 64
    label_nc: int = 3     # KITTI modification: label = rendered RGB
    crop_size: int = 256
    aspect_ratio: float = 1.0
    axis_name: str | None = None
    use_vae: bool = False
    z_dim: int = 256

    @property
    def latent_hw(self) -> tuple[int, int]:
        num_up_layers = 5
        sw = self.crop_size // (2 ** num_up_layers)
        sh = max(int(round(sw / self.aspect_ratio)), 1)
        return sh, sw

    @nn.compact
    def __call__(self, seg: jax.Array, z: jax.Array | None = None,
                 train: bool = True) -> jax.Array:
        nf = self.ngf
        sh, sw = self.latent_hw

        if self.use_vae:
            # VAE head (generator.py:44-55): dense z -> the 16nf latent grid
            if z is None:
                z = jnp.zeros((seg.shape[0], self.z_dim), seg.dtype)
            x = nn.Dense(16 * nf * sh * sw, name="fc_vae")(z)
            x = x.reshape(seg.shape[0], sh, sw, 16 * nf)
        else:
            x = _resize_nearest(seg, sh, sw)
            x = nn.Conv(16 * nf, (3, 3), padding=1, name="fc")(x)

        def up(t):
            return _resize_nearest(t, t.shape[1] * 2, t.shape[2] * 2)

        x = SPADEResnetBlock(16 * nf, 16 * nf, self.axis_name, name="head_0")(x, seg, train)
        x = up(x)
        x = SPADEResnetBlock(16 * nf, 16 * nf, self.axis_name, name="G_middle_0")(x, seg, train)
        x = SPADEResnetBlock(16 * nf, 16 * nf, self.axis_name, name="G_middle_1")(x, seg, train)
        x = up(x)
        x = SPADEResnetBlock(16 * nf, 8 * nf, self.axis_name, name="up_0")(x, seg, train)
        x = up(x)
        x = SPADEResnetBlock(8 * nf, 4 * nf, self.axis_name, name="up_1")(x, seg, train)
        x = up(x)
        x = SPADEResnetBlock(4 * nf, 2 * nf, self.axis_name, name="up_2")(x, seg, train)
        x = up(x)
        x = SPADEResnetBlock(2 * nf, 1 * nf, self.axis_name, name="up_3")(x, seg, train)
        x = nn.Conv(3, (3, 3), padding=1, name="conv_img")(
            nn.leaky_relu(x, LRELU_SLOPE)
        )
        return jnp.tanh(x)


class NLayerDiscriminator(nn.Module):
    """discriminator.py NLayerDiscriminator: 4-layer PatchGAN with
    instance-normed spectral convs, returns all intermediate features."""

    ndf: int = 64
    n_layers: int = 4
    input_nc: int = 6  # label(3) + image(3)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> list[jax.Array]:
        kw, padw = 4, 2
        feats = []
        h = nn.Conv(self.ndf, (kw, kw), strides=2, padding=padw, name="conv0")(x)
        h = nn.leaky_relu(h, LRELU_SLOPE)
        feats.append(h)
        nf = self.ndf
        for i in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            stride = 1 if i == self.n_layers - 1 else 2
            h = _sn(nn.Conv(nf, (kw, kw), strides=stride, padding=padw,
                            name=f"conv{i}"))(h, update_stats=train)
            # instance norm (norm_layer 'spectralinstance')
            mean = h.mean(axis=(1, 2), keepdims=True)
            var = h.var(axis=(1, 2), keepdims=True)
            h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            feats.append(h)
        h = nn.Conv(1, (kw, kw), strides=1, padding=padw, name="conv_out")(h)
        feats.append(h)
        return feats


class MultiscaleDiscriminator(nn.Module):
    """discriminator.py MultiscaleDiscriminator: num_D=2 PatchGANs, the
    second on a 2x avg-pooled input."""

    num_d: int = 2
    ndf: int = 64
    n_layers: int = 4
    input_nc: int = 6

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> list[list[jax.Array]]:
        outs = []
        h = x
        for d in range(self.num_d):
            outs.append(
                NLayerDiscriminator(
                    self.ndf, self.n_layers, self.input_nc, name=f"D{d}"
                )(h, train)
            )
            if d != self.num_d - 1:
                h = nn.avg_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return outs


class ConvEncoder(nn.Module):
    """encoder.py ConvEncoder -> (mu, logvar) for the optional VAE mode."""

    ndf: int = 64
    z_dim: int = 256
    crop_size: int = 256

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True):
        if x.shape[1] != 256 or x.shape[2] != 256:
            x = jax.image.resize(
                x, (x.shape[0], 256, 256, x.shape[-1]), method="bilinear"
            )
        nf = self.ndf
        widths = [nf, nf * 2, nf * 4, nf * 8, nf * 8, nf * 8]
        h = x
        for i, w in enumerate(widths):
            h = _sn(nn.Conv(w, (3, 3), strides=2, padding=1, name=f"layer{i}"))(
                h, update_stats=train
            )
            mean = h.mean(axis=(1, 2), keepdims=True)
            var = h.var(axis=(1, 2), keepdims=True)
            h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
            if i < len(widths) - 1:
                h = nn.leaky_relu(h, LRELU_SLOPE)
        h = nn.leaky_relu(h, LRELU_SLOPE)
        h = h.reshape(h.shape[0], -1)
        mu = nn.Dense(self.z_dim, name="fc_mu")(h)
        logvar = nn.Dense(self.z_dim, name="fc_var")(h)
        return mu, logvar
