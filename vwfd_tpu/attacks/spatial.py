"""Spatial attacks: resize round-trip, crop(+upscale-back), cropout, dropout.

TPU-native designs:
  * `resize_roundtrip` — the reference picks a continuous random ratio in
    [0.5, 1.5] and runs two `F.interpolate`s (noise_layers/resize.py:15-55).
    Under `jit` the intermediate size must be static, so we precompute, for a
    static pool of ratios, the combined down∘up resampling operator per axis
    (an (H, H) matrix — resize is linear!) and gather the operator with a
    *traced* ratio index: random per call/frame, one matmul per axis, zero
    recompilation.
  * `crop_attack` — crop + bilinear upscale-back (noise_layers/crop.py:32-52)
    fused into a single fixed-shape resampling with a traced apex.
"""

import functools
import numpy as np
import jax
import jax.numpy as jnp

from ..ops.resize import resize_matrix, crop_resize

DEFAULT_RATIOS = tuple(np.round(np.arange(0.5, 1.51, 0.05), 2))


@functools.lru_cache(maxsize=None)
def make_resize_roundtrip_pool(size: int, ratios=DEFAULT_RATIOS,
                               method: str = "bicubic"):
    """Stack of (size, size) combined down→up resampling matrices, one per ratio."""
    mats = []
    for r in ratios:
        s = max(8, int(r * size))
        down = np.asarray(resize_matrix(size, s, method))
        up = np.asarray(resize_matrix(s, size, method))
        mats.append(up @ down)
    return np.stack(mats).astype(np.float32)  # numpy: lru_cache-safe under traces


def resize_roundtrip(key, img, ratios=DEFAULT_RATIOS, method: str = "bicubic"):
    """Random-ratio bicubic down/up round trip + clamp (noise_layers/resize.py)."""
    h, w = img.shape[-3], img.shape[-2]
    mh = make_resize_roundtrip_pool(h, ratios, method)
    mw = mh if w == h else make_resize_roundtrip_pool(w, ratios, method)
    idx = jax.random.randint(key, (), 0, len(ratios))
    a, b = jnp.asarray(mh)[idx], jnp.asarray(mw)[idx]
    out = jnp.einsum("oh,...hwc->...owc", a, img,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("pw,...owc->...opc", b, out,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.clip(out, 0.0, 1.0)


def sample_crop_apex(key, hw, min_rate=0.5, max_rate=1.0):
    """Random crop rectangle with the reference's coupled height/width ratios
    (noise_layers/crop.py:32-44: each ratio clipped to within 0.2 of the other).
    Returns float apex (h0, h1, w0, w1) in pixels; traced-safe."""
    h, w = hw
    kh, kw, ky, kx = jax.random.split(key, 4)
    hr = jax.random.uniform(kh, (), minval=min_rate, maxval=max_rate)
    wr = jax.random.uniform(kw, (), minval=min_rate, maxval=max_rate)
    hr = jnp.minimum(hr, wr + 0.2)
    wr = jnp.minimum(wr, hr + 0.2)
    ch = jnp.floor(hr * h)
    cw = jnp.floor(wr * w)
    h0 = jnp.floor(jax.random.uniform(ky, ()) * (h - ch + 1))
    w0 = jnp.floor(jax.random.uniform(kx, ()) * (w - cw + 1))
    return (h0, h0 + ch, w0, w0 + cw)


def crop_attack(key, img, apex=None, min_rate=0.5, max_rate=1.0,
                method: str = "bilinear"):
    """Crop a random rectangle and upscale back to full size; returns
    (attacked, apex) like `Crop.forward` (noise_layers/crop.py:32-52)."""
    hw = (img.shape[-3], img.shape[-2])
    if apex is None:
        apex = sample_crop_apex(key, hw, min_rate, max_rate)
    return crop_resize(img, apex, method=method), apex


def rect_mask(hw, apex):
    """(H, W) float mask, 1 inside `apex` — fixed-shape stand-in for slicing."""
    h, w = hw
    h0, h1, w0, w1 = apex
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    return ((ys >= h0) & (ys < h1) & (xs >= w0) & (xs < w1)).astype(jnp.float32)


def cropout(key, img, cover, height_ratio=0.5, width_ratio=0.5):
    """Paste a random rectangle of `img` onto `cover`
    (noise_layers/crop.py Cropout:121-133)."""
    hw = (img.shape[-3], img.shape[-2])
    h0 = jnp.floor(jax.random.uniform(key, ()) * (hw[0] * (1 - height_ratio)))
    k2 = jax.random.fold_in(key, 1)
    w0 = jnp.floor(jax.random.uniform(k2, ()) * (hw[1] * (1 - width_ratio)))
    apex = (h0, h0 + hw[0] * height_ratio, w0, w0 + hw[1] * width_ratio)
    m = rect_mask(hw, apex)[..., None]
    return img * m + cover * (1 - m)


def dropout_mix(key, img, cover, keep_min=0.5, keep_max=1.0):
    """Keep-ratio pixel mixing of attacked and cover image
    (noise_layers/dropout.py:4-26)."""
    k1, k2 = jax.random.split(key)
    keep = jax.random.uniform(k1, (), minval=keep_min, maxval=keep_max)
    mask = (jax.random.uniform(k2, img.shape[-3:-1]) < keep).astype(img.dtype)
    mask = mask[..., None]
    return img * mask + cover * (1 - mask)
