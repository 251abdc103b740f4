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


def test_weighted_noiser_biases_draws(rng):
    """make_combined_noiser(weights) draws hard members more often; a
    one-hot weight vector pins the draw (the oversampling mechanism of
    tools/continue_hidden.py)."""
    from vwfd_tpu.models.hidden_model import NOISE_POOL, make_combined_noiser

    assert [n for n, _ in NOISE_POOL] == [
        "identity", "crop", "cropout", "dropout", "gaussian", "jpeg_mask"]
    enc = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    cover = jnp.zeros_like(enc)
    only_identity = jax.jit(make_combined_noiser([1, 0, 0, 0, 0, 0]))
    for i in range(4):
        np.testing.assert_array_equal(
            np.asarray(only_identity(jax.random.PRNGKey(i), enc, cover)),
            np.asarray(enc))
    # cropout-only: output is enc inside one rect, cover (zeros) outside
    only_cropout = jax.jit(make_combined_noiser([0, 0, 1, 0, 0, 0]))
    out = np.asarray(only_cropout(jax.random.PRNGKey(3), enc, cover))
    kept = (out != 0).any(-1).mean()
    assert 0.15 < kept < 0.35  # 0.5×0.5 rect of the area


def test_cropout_area_ratio_override(rng):
    """cropout's height/width ratios set the kept-area share — the
    paper-geometry eval point (p=0.30) uses ratio sqrt(0.30) per axis."""
    from vwfd_tpu.attacks.spatial import cropout

    enc = jnp.ones((1, 64, 64, 3))
    cover = jnp.zeros_like(enc)
    out = np.asarray(cropout(jax.random.PRNGKey(0), enc, cover,
                             height_ratio=0.5477, width_ratio=0.5477))
    kept = out.mean()
    assert abs(kept - 0.30) < 0.03


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
