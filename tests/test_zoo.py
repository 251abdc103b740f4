"""Shape/property tests for the remaining net zoo + trainers (tiny configs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vwfd_tpu import nets
from vwfd_tpu.ops.dwt import dwt, iwt


def test_dwt_iwt_roundtrip(rng):
    x = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    d = dwt(x)
    assert d.shape == (2, 8, 8, 12)
    np.testing.assert_allclose(np.asarray(iwt(d)), np.asarray(x), atol=1e-6)


def test_dwt_band_layout(rng):
    # constant image → all energy in the LL block (first C channels)
    x = jnp.ones((1, 8, 8, 2))
    d = np.asarray(dwt(x))
    assert np.allclose(d[..., :2], 2.0)
    assert np.allclose(d[..., 2:], 0.0)


def test_self_attention(rng):
    m = nets.SelfAttention()
    x = jnp.asarray(rng.random((1, 8, 8, 16), dtype=np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    # gamma starts at 0 → identity at init
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


@pytest.mark.slow
def test_edge_and_inpaint_generators(rng):
    x = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    eg = nets.EdgeGenerator(residual_blocks=1)
    v = eg.init(jax.random.PRNGKey(0), x)
    out, _ = eg.apply(v, x, mutable=["spectral"])
    assert out.shape == (1, 32, 32, 1)

    ig = nets.InpaintGenerator(residual_blocks=1)
    v = ig.init(jax.random.PRNGKey(0), x)
    out = ig.apply(v, x)
    assert out.shape == x.shape
    assert float(out.min()) >= 0 and float(out.max()) <= 1


def test_normal_generator(rng):
    m = nets.NormalGenerator(channels=3, down_num=2, block_num=(1, 1))
    x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == x.shape


@pytest.mark.slow
def test_legacy_inv_rescale_net_invertibility(rng):
    m = nets.InvRescaleNet(channel_in=3, down_num=2, block_num=(2, 2))
    x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 4, 4, 48)
    x_rec = m.apply(v, y, rev=True)
    assert float(jnp.abs(x_rec - x).max()) < 1e-4


def test_vgg128_discriminator(rng):
    m = nets.DiscriminatorVGG128(base=8)
    x = jnp.asarray(rng.random((2, 128, 128, 3), dtype=np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out, _ = m.apply(v, x, mutable=["batch_stats"])
    assert out.shape == (2, 1)


def test_crop_localize_net(rng):
    m = nets.CropLocalizeNet(out_dims=4, base=8)
    x = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out, _ = m.apply(v, x, mutable=["batch_stats"])
    assert out.shape == (2, 4)


def test_bsr_wavelet_net(rng):
    m = nets.BSR(n_feats=8, n=1)
    x = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    # the reference BSR skips the final IWT (mwnet.py:107-113 "# x without
    # IWT") → output at half the input resolution
    assert out.shape == (1, 16, 16, 1)
    assert float(out.min()) >= 0 and float(out.max()) <= 1


@pytest.mark.slow
def test_srmnet(rng):
    m = nets.SRMNet(out_channels=1, wf=8, depth=3)
    x = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 32, 32, 1)


@pytest.mark.slow
def test_sunet_swin_unet(rng):
    m = nets.SUNet(out_channels=1, embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                   window_size=4, apply_sigmoid=True)
    x = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 32, 32, 1)
    assert float(out.min()) >= 0 and float(out.max()) <= 1


def test_mantranet(rng):
    m = nets.MantraNet()
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 1)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_attacknet(rng):
    m = nets.AttackNet(channels=3, down_num=2)
    x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == x.shape


def test_gaussianize_roundtrip(rng):
    # reference semantics: net(x1) outputs 4·n ch, split into (m, s) of 2·n
    # each, so x2 must carry 2·n channels (invertible_net.py:99-116)
    m = nets.Gaussianize(n_channels=2)
    x1 = jnp.asarray(rng.random((1, 8, 8, 2), dtype=np.float32))
    x2 = jnp.asarray(rng.random((1, 8, 8, 4), dtype=np.float32))
    v = m.init(jax.random.PRNGKey(0), x1, x2)
    z2 = m.apply(v, x1, x2)
    x2_rec = m.apply(v, x1, z2, rev=True)
    np.testing.assert_allclose(np.asarray(x2_rec), np.asarray(x2), atol=1e-5)


def test_squeeze_roundtrip(rng):
    x = jnp.asarray(rng.random((1, 8, 8, 3), dtype=np.float32))
    s = nets.squeeze2x(x)
    assert s.shape == (1, 4, 4, 12)
    np.testing.assert_allclose(np.asarray(nets.squeeze2x(s, rev=True)),
                               np.asarray(x), atol=1e-7)
