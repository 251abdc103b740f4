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


def resize_roundtrip(key, img, ratios=DEFAULT_RATIOS, method: str = "bicubic",
                     precision=None):
    """Random-ratio bicubic down/up round trip + clamp (noise_layers/resize.py).
    `precision=None` → HIGHEST; the video attack pool passes DEFAULT (bf16)."""
    h, w = img.shape[-3], img.shape[-2]
    mh = make_resize_roundtrip_pool(h, ratios, method)
    mw = mh if w == h else make_resize_roundtrip_pool(w, ratios, method)
    idx = jax.random.randint(key, (), 0, len(ratios))
    a, b = jnp.asarray(mh)[idx], jnp.asarray(mw)[idx]
    prec = precision if precision is not None else jax.lax.Precision.HIGHEST
    out = jnp.einsum("oh,...hwc->...owc", a, img, precision=prec)
    out = jnp.einsum("pw,...owc->...opc", b, out, precision=prec)
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


def shift_zero_pad(x, dx, dy):
    """Shift (..., H, W, C) by (dx, dy) pixels with zero fill — the TPU
    fixed-shape equivalent of the reference's "two times padding" trick
    (models/IRNp_model.py:568-595): `out[i, j] = x[i - dx, j - dy]`, zeros
    where the source index falls outside the frame. dx/dy may be traced
    (|dx| ≤ H/2, |dy| ≤ W/2)."""
    h, w = x.shape[-3], x.shape[-2]
    ph, pw = h // 2, w // 2
    pad = [(0, 0)] * (x.ndim - 3) + [(ph, ph), (pw, pw), (0, 0)]
    xp = jnp.pad(x, pad)
    start = [0] * (x.ndim - 3) + [ph - dx, pw - dy, 0]
    return jax.lax.dynamic_slice(xp, [jnp.asarray(s, jnp.int32) for s in start],
                                 x.shape)


def copy_move_tamper(key, img, mask, max_shift_frac=0.5):
    """Copy-move self-paste tamper (models/IRNp_model.py:561-601): shift the
    (detached) image and its stroke mask by one random (x, y) offset drawn
    uniformly in ±H/2 × ±W/2, then paste the shifted content through the
    shifted mask. The shifted mask becomes the new ground-truth tamper mask
    (zero where the shift ran off the frame, so the paste is a no-op there).

    img: (B, H, W, C), mask: (B, H, W, 1). Returns (tampered, shifted_mask);
    the pasted source is stop-gradded like the reference's `.clone().detach()`.
    """
    h, w = img.shape[-3], img.shape[-2]
    kx, ky = jax.random.split(key)
    dx = jnp.floor(h * max_shift_frac * (
        2.0 * jax.random.uniform(kx, ()) - 1.0)).astype(jnp.int32)
    dy = jnp.floor(w * max_shift_frac * (
        2.0 * jax.random.uniform(ky, ()) - 1.0)).astype(jnp.int32)
    src = jax.lax.stop_gradient(img)
    shifted = shift_zero_pad(src, dx, dy)
    shifted_mask = jnp.clip(shift_zero_pad(mask, dx, dy), 0.0, 1.0)
    tampered = img * (1.0 - shifted_mask) + shifted * shifted_mask
    return tampered, shifted_mask


def paste_resize(scaled, apex, method: str = "bicubic"):
    """Inverse of `crop_resize`: resample a full-size image back to the crop
    window size and place it at the crop's original position in a zero canvas
    (the `scaled_back`/`scaled_back_padded` step of noise_layers/crop.py:105-117
    and models/IRNclr_model.py:560-570), fused into one fixed-shape resample
    with a traced apex.

    scaled: (..., H, W, C); apex (h0, h1, w0, w1) in pixels (traced OK).
    """
    h, w = scaled.shape[-3], scaled.shape[-2]
    h0, h1, w0, w1 = [jnp.asarray(v, jnp.float32) for v in apex]
    ch, cw = h1 - h0, w1 - w0
    # Output pixel i inside [h0, h1) maps to source row ((i - h0) + 0.5)·H/ch − 0.5
    ys = ((jnp.arange(h, dtype=jnp.float32) - h0) + 0.5) * h / ch - 0.5
    xs = ((jnp.arange(w, dtype=jnp.float32) - w0) + 0.5) * w / cw - 0.5
    from ..ops.resize import _sample_axis
    out = _sample_axis(scaled, ys, axis=scaled.ndim - 3, method=method)
    out = _sample_axis(out, xs, axis=out.ndim - 2, method=method)
    inside = rect_mask((h, w), apex)[..., None]
    return jnp.clip(out, 0.0, 1.0) * inside


def cropped_out(img, apex):
    """The zero-padded-frame crop variant (`Crop.cropped_out`,
    noise_layers/crop.py:77-118): crop `apex`, upscale to full size, and also
    return the zero-padded original-position frame via the dual-reshape
    straight-through trick — `real = ideal + stop_grad(scaled_back − ideal)`
    where `ideal = img·inside_mask` — so the rectified frame has the *values*
    of the crop→resize→resize-back round trip but gradients of the clean crop.

    Returns (scaled_images, real_crop_pad, mask) with mask = 1 OUTSIDE the
    crop (the reference's masks_GT convention, models/IRNclr_model.py:470-485).
    """
    h, w = img.shape[-3], img.shape[-2]
    scaled = jnp.clip(crop_resize(img, apex, method="bicubic"), 0.0, 1.0)
    inside = rect_mask((h, w), apex)[..., None]
    ideal = img * inside
    scaled_back = paste_resize(scaled, apex)
    real = ideal + jax.lax.stop_gradient(scaled_back - ideal)
    return scaled, real, 1.0 - inside


def rectify_crop_pad(attacked, clean, apex):
    """Scale-back rectification before the reverse pass
    (models/IRNclr_model.py:556-575): `ideal = clean·inside`,
    `real = ideal + stop_grad(paste_resize(attacked) − ideal)` — the reverse
    input carries the attacked crop's values at its original position (zeros
    outside) while gradients flow through the clean forward image."""
    h, w = attacked.shape[-3], attacked.shape[-2]
    inside = rect_mask((h, w), apex)[..., None]
    ideal = clean * inside
    scaled_back = paste_resize(attacked, apex)
    return ideal + jax.lax.stop_gradient(scaled_back - ideal)
