"""Shape/finiteness tests for the MBRS and FBCNN families."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vwfd_tpu import nets


@pytest.mark.slow
def test_mbrs_encoder_decoder_roundtrip_shapes(rng):
    h, msg_len = 64, 30
    enc = nets.MBRSEncoder(height=h, message_length=msg_len, channels=16,
                           blocks=1, diffusion_length=64)
    dec = nets.MBRSDecoder(height=h, message_length=msg_len, channels=16,
                           diffusion_length=64)
    img = jnp.asarray(rng.random((2, h, h, 3), dtype=np.float32))
    msg = jnp.asarray((rng.random((2, msg_len)) > 0.5).astype(np.float32))
    ev = enc.init(jax.random.PRNGKey(0), img, msg)
    out, _ = enc.apply(ev, img, msg, mutable=["batch_stats"])
    assert out.shape == img.shape
    dv = dec.init(jax.random.PRNGKey(1), out)
    dec_msg, _ = dec.apply(dv, out, mutable=["batch_stats"])
    assert dec_msg.shape == msg.shape
    assert np.isfinite(np.asarray(dec_msg)).all()


def test_mbrs_plain_decoder(rng):
    d = nets.MBRSPlainDecoder(out_num=4, channels=8)
    img = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    v = d.init(jax.random.PRNGKey(0), img)
    out, _ = d.apply(v, img, mutable=["batch_stats"])
    assert out.shape == (2, 4)
    assert float(out.min()) >= 0 and float(out.max()) <= 1  # (tanh+1)/2


def test_baluja_trio(rng):
    cover = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    secret = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    prep = nets.BalujaPrep(features=8)
    pv = prep.init(jax.random.PRNGKey(0), secret)
    prepped = prep.apply(pv, secret)
    hide = nets.BalujaHiding(features=8)
    hv = hide.init(jax.random.PRNGKey(1),
                   jnp.concatenate([cover, prepped], -1))
    container = hide.apply(hv, jnp.concatenate([cover, prepped], -1))
    assert container.shape == cover.shape
    reveal = nets.BalujaReveal(features=8)
    rv = reveal.init(jax.random.PRNGKey(2), container)
    revealed = reveal.apply(rv, container)
    assert revealed.shape == secret.shape


def test_fbcnn_qf_conditioning(rng):
    m = nets.FBCNN(nc=(8, 12, 16, 24), nb=1)
    x = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    qf = jnp.asarray([[0.5]], dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, qf)
    out, feats = m.apply(v, x, qf)
    assert out.shape == x.shape
    assert len(feats) == 4
    # conditioning must matter: different QF → different output
    out2, _ = m.apply(v, x, jnp.asarray([[0.1]], dtype=jnp.float32))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_qf_predictor_modes(rng):
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    clf = nets.QFPredictor(nc=(8, 12, 16, 24), nb=1, classes=5)
    v = clf.init(jax.random.PRNGKey(0), x)
    feats, logits = clf.apply(v, x)
    assert logits.shape == (1, 5)

    crop = nets.QFPredictor(nc=(8, 12, 16, 24), nb=1, classes=4,
                            crop_pred=True, out_size=64)
    v2 = crop.init(jax.random.PRNGKey(0), x)
    mask, apex = crop.apply(v2, x)
    assert mask.shape == (1, 64, 64, 1)
    assert apex.shape == (1, 4)
