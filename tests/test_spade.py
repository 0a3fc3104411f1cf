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
