"""Attack-layer tests. Behavioral oracle for JPEG parity is real PIL JPEG —
the same oracle the reference uses (`JpegTest`, noise_layers/jpeg.py:10-45)."""

import io

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from vwfd_tpu import attacks


def _test_image():
    # Smooth-ish natural-image stand-in: random low-freq mixture.
    rng = np.random.default_rng(3)
    yy, xx = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 64), indexing="ij")
    img = np.stack([
        0.5 + 0.3 * np.sin(6 * xx + 2 * yy) + 0.1 * rng.random((64, 64)),
        0.5 + 0.3 * np.cos(4 * yy) + 0.1 * rng.random((64, 64)),
        0.5 + 0.2 * np.sin(3 * xx * yy) + 0.1 * rng.random((64, 64)),
    ], axis=-1).clip(0, 1).astype(np.float32)
    return img[None]


def _pil_jpeg(img01, quality, subsampling):
    u8 = (np.asarray(img01)[0] * 255).round().astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(u8).save(buf, format="JPEG", quality=quality,
                             subsampling=subsampling)
    out = np.asarray(Image.open(buf), dtype=np.float32) / 255.0
    return out[None]


def _psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 10 * np.log10(1.0 / mse)


@pytest.mark.parametrize("q", [50, 90])
def test_jpeg_basic_close_to_real_jpeg(q):
    img = _test_image()
    ours = np.asarray(attacks.jpeg_basic(jnp.asarray(img), q, subsample=0))
    real = _pil_jpeg(img, q, subsampling=0)
    assert _psnr(ours, real) > 27.0, _psnr(ours, real)
    # and the attack must be closer to the real-JPEG output than identity is
    assert _psnr(ours, real) > _psnr(img, real)


def test_jpeg_quality_monotonic():
    img = _test_image()
    p90 = _psnr(np.asarray(attacks.jpeg_basic(jnp.asarray(img), 90)), img)
    p50 = _psnr(np.asarray(attacks.jpeg_basic(jnp.asarray(img), 50)), img)
    assert p90 > p50


def test_diffjpeg_close_to_real_420_jpeg():
    img = _test_image()
    ours = np.asarray(attacks.diffjpeg(jnp.asarray(img), 80, rounding=jnp.round))
    real = _pil_jpeg(img, 80, subsampling=2)  # 4:2:0
    assert _psnr(ours, real) > 27.0, _psnr(ours, real)


def test_diffjpeg_differentiable():
    img = jnp.asarray(_test_image())
    g = jax.grad(lambda x: jnp.sum(attacks.diffjpeg(x, 75)))(img)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_jpeg_mask_lowpass():
    img = jnp.asarray(_test_image())
    out = attacks.jpeg_mask(img)
    # zonal mask keeps DC: means should be close; high-freq energy reduced
    assert abs(float(out.mean() - img.mean())) < 0.02
    hf = lambda x: float(jnp.abs(jnp.diff(x, axis=-2)).mean())
    assert hf(out) < hf(img)


def test_jpeg_pool_runs_all_modes():
    img = jnp.asarray(_test_image())
    outs = [np.asarray(attacks.jpeg_pool(jax.random.PRNGKey(i), img)) for i in range(6)]
    for o in outs:
        assert _psnr(o, np.asarray(img)) > 20.0
    # different keys should give different draws at least once
    assert any(not np.allclose(outs[0], o) for o in outs[1:])


def test_zigzag_mask_counts():
    m = np.asarray(attacks.zigzag_keep_mask(8, 25, 8, 8))
    assert m.sum() == 25
    assert m[0, 0] == 1  # DC always kept


def test_hidden_jpeg_mask_compression_shape():
    img = jnp.asarray(_test_image())
    out = attacks.hidden_jpeg_mask_compression(img)
    assert out.shape == img.shape
    assert _psnr(np.asarray(out), np.asarray(img)) > 15.0


def test_resize_roundtrip_random_and_clipped():
    img = jnp.asarray(_test_image())
    o1 = attacks.resize_roundtrip(jax.random.PRNGKey(0), img)
    o2 = attacks.resize_roundtrip(jax.random.PRNGKey(5), img)
    assert o1.shape == img.shape
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    assert float(o1.min()) >= 0.0 and float(o1.max()) <= 1.0


def test_crop_attack_shapes_and_apex():
    img = jnp.asarray(_test_image())
    out, apex = attacks.crop_attack(jax.random.PRNGKey(1), img)
    assert out.shape == img.shape
    h0, h1, w0, w1 = [float(a) for a in apex]
    assert 0 <= h0 < h1 <= 64 and 0 <= w0 < w1 <= 64
    assert (h1 - h0) >= 0.5 * 64 - 1  # min_rate=0.5


def test_noise_attacks():
    img = jnp.asarray(_test_image()) * 0.5
    g = attacks.gaussian_noise(jax.random.PRNGKey(0), img)
    assert float(jnp.abs(g - img).mean()) > 0.01
    sp = np.asarray(attacks.salt_pepper(jax.random.PRNGKey(0), img, prob=0.5))
    assert (sp == 0).any() and (sp == 1).any()
    assert np.asarray(attacks.identity(None, img) == img).all()


def test_attack_pool_video_jit_and_grad():
    # tiny config: this exercises trace/grad correctness; scale is bench.py's job
    video = jnp.asarray(np.tile(_test_image()[:, :32, :32][:, None], (1, 2, 1, 1, 1)))
    ratios = (0.5, 1.0, 1.5)

    def loss(v, key):
        return jnp.sum(attacks.attack_pool_video(key, v, ratios=ratios))

    val, g = jax.jit(jax.value_and_grad(loss))(video, jax.random.PRNGKey(0))
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g)).all()
    assert g.shape == video.shape


def test_stegastamp_extras():
    from vwfd_tpu.attacks import (random_blur_kernel, apply_blur_kernel,
                                  random_perspective, random_brightness_hue)
    img = jnp.asarray(_test_image())
    k = random_blur_kernel(jax.random.PRNGKey(0))
    assert k.shape == (7, 7)
    assert abs(float(k.sum()) - 1.0) < 1e-5
    blurred = apply_blur_kernel(img, k)
    assert blurred.shape == img.shape

    warped = random_perspective(jax.random.PRNGKey(1), img, d=4.0)
    assert warped.shape == img.shape
    assert not np.allclose(np.asarray(warped), np.asarray(img))
    # zero jitter → identity warp
    ident = random_perspective(jax.random.PRNGKey(1), img, d=0.0)
    np.testing.assert_allclose(np.asarray(ident), np.asarray(img), atol=1e-3)

    bh = random_brightness_hue(jax.random.PRNGKey(2), img)
    assert bh.shape == img.shape


def test_gradient_penalty():
    from vwfd_tpu.metrics import gradient_penalty
    real = jnp.asarray(_test_image())
    fake = jnp.asarray(np.clip(_test_image() + 0.1, 0, 1))

    def disc(x):
        return jnp.mean(x ** 2, axis=(1, 2, 3))

    gp = gradient_penalty(disc, jax.random.PRNGKey(0), real, fake)
    assert np.isfinite(float(gp))


def test_jpeg_pool_pair_matches_weighted_sum(rng):
    """Fused pair == w1·jpeg_pool(k1) + w2·jpeg_pool(k2) (same key splits)."""
    import jax
    import jax.numpy as jnp
    from vwfd_tpu.attacks.jpeg import jpeg_pool, jpeg_pool_pair
    img = jnp.asarray(rng.random((16, 16, 3), dtype=np.float32))
    k1, k2 = jax.random.PRNGKey(5), jax.random.PRNGKey(9)
    w1, w2 = 0.3, 0.55
    ref = w1 * jpeg_pool(k1, img) + w2 * jpeg_pool(k2, img)
    fused = jpeg_pool_pair(k1, k2, img, w1, w2)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=2e-5, rtol=0)
