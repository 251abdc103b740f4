"""Trainer tests for the HiDDeN and MBRS families (tiny configs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vwfd_tpu.models.hidden_model import HiddenModel
from vwfd_tpu.models.mbrs_model import MBRSModel


def _imgs_msgs(rng, b=2, s=32, ml=8):
    imgs = jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32))
    msgs = jnp.asarray((rng.random((b, ml)) > 0.5).astype(np.float32))
    return imgs, msgs


@pytest.mark.slow
def test_hidden_train_step(rng):
    model = HiddenModel(message_length=8, image_size=32, encoder_channels=8,
                        encoder_blocks=2, decoder_channels=8, decoder_blocks=3,
                        discriminator_channels=8, discriminator_blocks=2)
    states = model.init_states(jax.random.PRNGKey(0))
    imgs, msgs = _imgs_msgs(rng)
    # train_step donates `states` — snapshot host-side before the call
    before = [np.asarray(x)
              for x in jax.tree_util.tree_leaves(states["encoder"].params)]
    new_states, logs = model.train_step(states, imgs, msgs, jax.random.PRNGKey(1))
    for k in ("loss", "encoder_mse", "dec_mse", "bitwise_error",
              "adversarial_bce", "discr_cover_bce", "discr_encod_bce"):
        assert np.isfinite(float(logs[k])), k
    after = jax.tree_util.tree_leaves(new_states["encoder"].params)
    assert any(not np.allclose(a, np.asarray(b))
               for a, b in zip(before, after))


def test_hidden_infer_with_noise(rng):
    from vwfd_tpu.attacks import gaussian_noise

    def noiser(key, enc, cover):
        return gaussian_noise(key, jnp.clip(enc, 0, 1))

    model = HiddenModel(message_length=8, image_size=32, encoder_channels=8,
                        encoder_blocks=2, decoder_channels=8, decoder_blocks=3,
                        noiser=noiser)
    states = model.init_states(jax.random.PRNGKey(0))
    imgs, msgs = _imgs_msgs(rng)
    enc, noised, dec = model.infer(states, imgs, msgs, jax.random.PRNGKey(2))
    assert enc.shape == imgs.shape
    assert dec.shape == msgs.shape
    assert not np.allclose(np.asarray(enc), np.asarray(noised))


@pytest.mark.slow
def test_mbrs_train_step(rng):
    model = MBRSModel(image_size=32, message_length=8, channels=8, blocks=1,
                      diffusion_length=64)
    states = model.init_states(jax.random.PRNGKey(0))
    imgs, msgs = _imgs_msgs(rng)
    # train_step donates `states` — snapshot host-side before the call
    before = [np.asarray(x)
              for x in jax.tree_util.tree_leaves(states["decoder"].params)]
    new_states, logs = model.train_step(states, imgs, msgs, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["loss"]))
    assert 0.0 <= float(logs["bitwise_error"]) <= 1.0
    after = jax.tree_util.tree_leaves(new_states["decoder"].params)
    assert any(not np.allclose(a, np.asarray(b))
               for a, b in zip(before, after))
