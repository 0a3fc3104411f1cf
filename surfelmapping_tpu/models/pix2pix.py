"""Pix2Pix(SPADE) training: model bundle, TTUR optimizers, jitted G/D steps
with data-parallel sharding over a mesh.

Reference parity (SPADE/trainers/pix2pix_trainer.py, models/pix2pix_model.py):
  * mode-dispatched forward: generator / discriminator / inference;
  * TTUR Adam: G lr/2, D lr*2, betas (0, 0.9) (pix2pix_model.py:70-79);
  * G step every ``d_steps_per_g`` D steps (train.py:49-53);
  * losses: multiscale hinge GAN + feature-matching L1 + VGG perceptual;
  * fake and real are discriminated in ONE batch so BN stats match
    (pix2pix_model.py:208-223);
  * linear LR decay after ``niter`` epochs (pix2pix_trainer.py:66-86).

Distributed: the reference's DataParallel + SyncBN master/slave futures
(sync_batchnorm/) become a ``data`` mesh axis — batches are sharded with
NamedSharding(P("data")), parameters replicated, and BatchNorm's axis_name
psums the statistics.  That is the entire distributed runtime.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .losses import (
    VGG19Features,
    feature_matching_loss,
    load_vgg19_weights,
    multiscale_hinge_d,
    multiscale_hinge_g,
    vgg_loss,
)
from .losses import kld_loss
from .spade import ConvEncoder, MultiscaleDiscriminator, SPADEGenerator


@dataclasses.dataclass
class SpadeConfig:
    ngf: int = 64
    ndf: int = 64
    label_nc: int = 3
    crop_size: int = 256
    aspect_ratio: float = 1.0
    lr: float = 2e-4
    beta1: float = 0.0
    beta2: float = 0.9
    lambda_feat: float = 10.0
    lambda_vgg: float = 10.0
    use_vgg: bool = True
    num_d: int = 2
    n_layers_d: int = 4
    niter: int = 100        # epochs at constant lr (ref train_options.py)
    niter_decay: int = 100  # epochs of linear decay to zero
    use_vae: bool = False   # VAE mode (pix2pix_model.py:62-67): encode the
    # real image -> (mu, logvar), reparameterised z feeds the generator and
    # a KLD term joins the G loss
    lambda_kld: float = 0.05
    z_dim: int = 256
    axis_name: str | None = None  # only for pmap/shard_map callers; under
    # sharded jit (spade_train.py) batch stats/grads are already global


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    g_params: Any
    g_batch_stats: Any
    d_params: Any
    d_batch_stats: Any
    g_opt: Any
    d_opt: Any
    vgg_params: Any
    step: jax.Array


class SpadeTrainer:
    def __init__(self, cfg: SpadeConfig, seed: int = 0):
        self.cfg = cfg
        self.gen = SPADEGenerator(
            ngf=cfg.ngf,
            label_nc=cfg.label_nc,
            crop_size=cfg.crop_size,
            aspect_ratio=cfg.aspect_ratio,
            axis_name=cfg.axis_name,
            use_vae=cfg.use_vae,
            z_dim=cfg.z_dim,
        )
        self.enc = (
            ConvEncoder(ndf=cfg.ndf, z_dim=cfg.z_dim, crop_size=cfg.crop_size)
            if cfg.use_vae else None
        )
        self.disc = MultiscaleDiscriminator(
            num_d=cfg.num_d, ndf=cfg.ndf, n_layers=cfg.n_layers_d,
            input_nc=cfg.label_nc + 3,
        )
        self.vgg = VGG19Features()
        # inject_hyperparams exposes learning_rate as optimizer STATE so the
        # per-epoch linear decay (update_learning_rate) can adjust it without
        # rebuilding the jitted steps
        self.g_tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.lr / 2.0, b1=cfg.beta1, b2=cfg.beta2
        )
        self.d_tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.lr * 2.0, b1=cfg.beta1, b2=cfg.beta2
        )
        self.seed = seed
        self.old_lr = cfg.lr

    def update_learning_rate(self, state: "TrainState", epoch: int) -> "TrainState":
        """Linear LR decay to zero over the last ``niter_decay`` epochs
        (reference SPADE/trainers/pix2pix_trainer.py:66-86): constant for the
        first ``niter`` epochs, then old_lr - lr/niter_decay each epoch; TTUR
        split (G lr/2, D lr*2) is reapplied to the decayed base rate."""
        cfg = self.cfg
        if epoch > cfg.niter:
            new_lr = max(0.0, self.old_lr - cfg.lr / cfg.niter_decay)
        else:
            new_lr = self.old_lr
        if new_lr != self.old_lr:
            g_opt = state.g_opt._replace(hyperparams={
                **state.g_opt.hyperparams,
                "learning_rate": jnp.asarray(new_lr / 2.0, jnp.float32),
            })
            d_opt = state.d_opt._replace(hyperparams={
                **state.d_opt.hyperparams,
                "learning_rate": jnp.asarray(new_lr * 2.0, jnp.float32),
            })
            state = dataclasses.replace(state, g_opt=g_opt, d_opt=d_opt)
            self.old_lr = new_lr
        return state

    def current_lrs(self, state: "TrainState") -> tuple[float, float]:
        """(G lr, D lr) as floats — observability for the train loop."""
        return (
            float(state.g_opt.hyperparams["learning_rate"]),
            float(state.d_opt.hyperparams["learning_rate"]),
        )

    # -- init ---------------------------------------------------------------

    def init_state(self, sample_label: jax.Array, sample_image: jax.Array) -> TrainState:
        k = jax.random.PRNGKey(self.seed)
        kg, kd, kv, ke = jax.random.split(k, 4)
        gvars = self.gen.init(kg, sample_label, train=False)
        if self.enc is not None:
            evars = self.enc.init(ke, sample_image, train=False)
            # the encoder trains with the generator (G_params += E.parameters,
            # pix2pix_model.py:250-252): bundle both under g_params
            gvars = {
                "params": {"gen": gvars["params"], "enc": evars["params"]},
                "batch_stats": {
                    "gen": gvars.get("batch_stats", {}),
                    "enc": evars.get("batch_stats", {}),
                },
            }
        dvars = self.disc.init(
            kd, jnp.concatenate([sample_label, sample_image], axis=-1), train=False
        )
        vgg_params = None
        if self.cfg.use_vgg:
            # prefer the pretrained torchvision checkpoint (reference
            # loss.py VGGLoss); fall back to fixed random features
            vgg_params = load_vgg19_weights()
            if vgg_params is None:
                vgg_params = self.vgg.init(kv, sample_image)
        g_params = gvars["params"]
        return TrainState(
            g_params=g_params,
            g_batch_stats=gvars.get("batch_stats", {}),
            d_params=dvars["params"],
            d_batch_stats=dvars.get("batch_stats", {}),
            g_opt=self.g_tx.init(g_params),
            d_opt=self.d_tx.init(dvars["params"]),
            vgg_params=vgg_params,
            step=jnp.zeros((), jnp.int32),
        )

    # -- forward helpers ----------------------------------------------------

    def _generate(self, params, batch_stats, label, train: bool,
                  real=None, rng=None):
        """Generator forward.  Non-VAE: label-conditioned as before.  VAE
        (pix2pix_model.py:135-150): encode ``real`` -> (mu, logvar),
        reparameterise with ``rng`` (mu alone when rng is None — the
        deterministic eval path), feed z to the generator.  Returns
        (fake, new_batch_stats, kld_aux) with kld_aux = (mu, logvar) or
        None."""
        if self.enc is None:
            variables = {"params": params, "batch_stats": batch_stats}
            if train:
                out, updates = self.gen.apply(
                    variables, label, train=True, mutable=["batch_stats"]
                )
                return out, updates["batch_stats"], None
            return self.gen.apply(variables, label, train=False), batch_stats, None

        evars = {"params": params["enc"], "batch_stats": batch_stats["enc"]}
        if real is None:
            mu = logvar = None
            z = None
            new_e_stats = batch_stats["enc"]
        elif train:
            (mu, logvar), eupd = self.enc.apply(
                evars, real, train=True, mutable=["batch_stats"]
            )
            new_e_stats = eupd["batch_stats"]
        else:
            mu, logvar = self.enc.apply(evars, real, train=False)
            new_e_stats = batch_stats["enc"]
        if mu is not None:
            if rng is not None:
                eps = jax.random.normal(rng, mu.shape, mu.dtype)
                z = mu + jnp.exp(0.5 * logvar) * eps
            else:
                z = mu
        gvars = {"params": params["gen"], "batch_stats": batch_stats["gen"]}
        if train:
            out, gupd = self.gen.apply(
                gvars, label, z, train=True, mutable=["batch_stats"]
            )
            new_g_stats = gupd["batch_stats"]
        else:
            out = self.gen.apply(gvars, label, z, train=False)
            new_g_stats = batch_stats["gen"]
        new_stats = {"gen": new_g_stats, "enc": new_e_stats}
        return out, new_stats, (None if mu is None else (mu, logvar))

    def _discriminate(self, d_params, d_stats, label, fake, real, train: bool):
        """One concatenated batch so normalization statistics are shared
        between fake and real halves (pix2pix_model.py:208-223).  Returns
        (fake_feats, real_feats, new_d_stats); d_stats holds SpectralNorm's
        power-iteration vectors."""
        fake_in = jnp.concatenate([label, fake], axis=-1)
        real_in = jnp.concatenate([label, real], axis=-1)
        both = jnp.concatenate([fake_in, real_in], axis=0)
        variables = {"params": d_params, "batch_stats": d_stats}
        if train:
            feats, updates = self.disc.apply(
                variables, both, train=True, mutable=["batch_stats"]
            )
            new_stats = updates["batch_stats"]
        else:
            feats = self.disc.apply(variables, both, train=False)
            new_stats = d_stats
        fake_feats, real_feats = [], []
        for scale in feats:
            fhalf = [f[: f.shape[0] // 2] for f in scale]
            rhalf = [f[f.shape[0] // 2 :] for f in scale]
            fake_feats.append(fhalf)
            real_feats.append(rhalf)
        return fake_feats, real_feats, new_stats

    # -- jitted steps -------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def g_step(self, state: TrainState, label: jax.Array, real: jax.Array):
        rng = (
            jax.random.fold_in(jax.random.PRNGKey(self.seed), state.step)
            if self.cfg.use_vae else None
        )

        def loss_fn(g_params):
            fake, new_stats, kld_aux = self._generate(
                g_params, state.g_batch_stats, label, train=True,
                real=real, rng=rng,
            )
            fake_feats, real_feats, _ = self._discriminate(
                state.d_params, state.d_batch_stats, label, fake, real, train=False
            )
            l_gan = multiscale_hinge_g(fake_feats)
            l_fm = feature_matching_loss(
                real_feats, fake_feats, self.cfg.lambda_feat
            )
            l_vgg = (
                vgg_loss(
                    lambda p, x: self.vgg.apply(p, x),
                    state.vgg_params, fake, real, self.cfg.lambda_vgg,
                )
                if self.cfg.use_vgg
                else 0.0
            )
            l_kld = (
                kld_loss(*kld_aux) * self.cfg.lambda_kld
                if kld_aux is not None else 0.0
            )
            total = l_gan + l_fm + l_vgg + l_kld
            logs = {"g_gan": l_gan, "g_fm": l_fm, "g_vgg": l_vgg}
            if kld_aux is not None:
                logs["g_kld"] = l_kld
            return total, (new_stats, logs)

        (loss, (new_stats, logs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.g_params)
        if self.cfg.axis_name:
            grads = jax.lax.pmean(grads, self.cfg.axis_name)
        updates, new_opt = self.g_tx.update(grads, state.g_opt, state.g_params)
        new_params = optax.apply_updates(state.g_params, updates)
        state = dataclasses.replace(
            state,
            g_params=new_params,
            g_batch_stats=new_stats,
            g_opt=new_opt,
            step=state.step + 1,
        )
        logs["g_total"] = loss
        return state, logs

    @functools.partial(jax.jit, static_argnums=0)
    def d_step(self, state: TrainState, label: jax.Array, real: jax.Array):
        rng = (
            jax.random.fold_in(
                jax.random.PRNGKey(self.seed ^ 0x5EED), state.step
            )
            if self.cfg.use_vae else None
        )
        fake, _, _ = self._generate(
            state.g_params, state.g_batch_stats, label, train=False,
            real=real, rng=rng,
        )
        fake = jax.lax.stop_gradient(fake)

        def loss_fn(d_params):
            fake_feats, real_feats, new_stats = self._discriminate(
                d_params, state.d_batch_stats, label, fake, real, train=True
            )
            return multiscale_hinge_d(real_feats, fake_feats), new_stats

        (loss, new_d_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.d_params
        )
        if self.cfg.axis_name:
            grads = jax.lax.pmean(grads, self.cfg.axis_name)
        updates, new_opt = self.d_tx.update(grads, state.d_opt, state.d_params)
        new_params = optax.apply_updates(state.d_params, updates)
        state = dataclasses.replace(
            state, d_params=new_params, d_batch_stats=new_d_stats, d_opt=new_opt
        )
        return state, {"d_total": loss}

    @functools.partial(jax.jit, static_argnums=0)
    def infer(self, state: TrainState, label: jax.Array,
              real: jax.Array | None = None) -> jax.Array:
        """Inference.  With use_vae, ``real`` (a style image) is encoded and
        its deterministic mu drives the generator (the reference's inference
        mode also encodes when opt.use_vae, pix2pix_model.py:93-100); without
        one the generator runs from z = 0."""
        fake, _, _ = self._generate(
            state.g_params, state.g_batch_stats, label, train=False, real=real
        )
        return fake


def shard_batch(mesh: Mesh, batch):
    """Place a batch with the leading axis sharded over the 'data' axis."""
    sh = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
