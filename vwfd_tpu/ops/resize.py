"""Separable image resampling as matmuls + jit-safe crop-with-resize.

TPU-first design choices:
  * Fixed-size resizes are expressed as two small dense matmuls
    (`M_h @ img @ M_w^T`) so they ride the MXU and fuse with neighbours,
    instead of the gather-based `F.interpolate` the reference relies on
    (noise_layers/resize.py:34-50, noise_layers/crop.py:40-46).
  * Random *crops* never change tensor shapes: `crop_resize` resamples the
    crop window onto the full output grid in one pass (crop + upscale-back
    fused), so crop rectangles can be traced values under `jit` — the
    TPU-native replacement for the reference's dynamic-shape slicing.

Kernel conventions match PyTorch `F.interpolate(align_corners=False)`:
half-pixel centers, edge clamp, bicubic with a = −0.75.
"""

import functools
import numpy as np
import jax
import jax.numpy as jnp


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    t = np.abs(t)
    return np.where(
        t <= 1.0, (a + 2.0) * t ** 3 - (a + 3.0) * t ** 2 + 1.0,
        np.where(t < 2.0, a * t ** 3 - 5.0 * a * t ** 2 + 8.0 * a * t - 4.0 * a, 0.0),
    )


def _linear_kernel(t: np.ndarray) -> np.ndarray:
    t = np.abs(t)
    return np.maximum(0.0, 1.0 - t)


def _lanczos_kernel(t: np.ndarray, a: int = 3) -> np.ndarray:
    """Lanczos-3 (utils/imresize.py lanczos path)."""
    t = np.abs(t)
    with np.errstate(divide="ignore", invalid="ignore"):
        k = np.sinc(t) * np.sinc(t / a)
    return np.where(t < a, k, 0.0)


@functools.lru_cache(maxsize=None)
def resize_matrix(in_size: int, out_size: int, method: str = "bilinear",
                  antialias: bool = False):
    """Dense (out_size, in_size) resampling matrix, half-pixel centers."""
    kernel = {"bilinear": _linear_kernel, "bicubic": _cubic_kernel,
              "lanczos": _lanczos_kernel}[method]
    support = {"bilinear": 1.0, "bicubic": 2.0, "lanczos": 3.0}[method]
    scale = in_size / out_size
    # Antialias widens the kernel when downscaling (like PIL / torch antialias=True).
    width = max(scale, 1.0) if antialias else 1.0
    src = (np.arange(out_size) + 0.5) * scale - 0.5  # (out,)
    idx = np.arange(in_size)  # (in,)
    t = (src[:, None] - idx[None, :]) / width
    w = kernel(t)
    # Edge clamp: fold out-of-range tap weight onto the clamped edge pixel.
    lo = src - support * width
    hi = src + support * width
    if lo.min() < 0 or hi.max() > in_size - 1:
        # Recompute with virtual out-of-range taps accumulated at the edges.
        reach = int(np.ceil(support * width)) + 1
        idx_ext = np.arange(-reach, in_size + reach)
        t_ext = (src[:, None] - idx_ext[None, :]) / width
        w_ext = kernel(t_ext)
        w = np.zeros((out_size, in_size))
        np.add.at(w.T, np.clip(idx_ext, 0, in_size - 1), w_ext.T)
    w = w / w.sum(axis=1, keepdims=True)
    # Return numpy: lru_cache must never capture a traced constant (a jnp array
    # materialized inside a jit trace is a tracer in JAX >= 0.9).
    return w.astype(np.float32)


def _resize(x, out_hw, method, antialias=False):
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    mh = resize_matrix(h, oh, method, antialias)
    mw = resize_matrix(w, ow, method, antialias)
    x = jnp.einsum("oh,...hwc->...owc", mh, x, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("pw,...owc->...opc", mw, x, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return x


def resize_bilinear(x, out_hw, antialias: bool = False):
    """Bilinear resize of (..., H, W, C) to (..., out_h, out_w, C)."""
    return _resize(x, out_hw, "bilinear", antialias)


def resize_bicubic(x, out_hw, antialias: bool = False):
    """Bicubic (a=−0.75) resize of (..., H, W, C)."""
    return _resize(x, out_hw, "bicubic", antialias)


def _sample_axis(x, coords, axis, method, bounds=None):
    """Resample `x` along `axis` at fractional positions `coords` (traced OK).

    `bounds=(lo, hi)` clamps tap indices into [lo, hi] — used by `crop_resize`
    to reproduce crop-then-interpolate edge semantics (taps outside the crop
    window clamp to the crop edge, not the image edge)."""
    n = x.shape[axis]
    if method == "bilinear":
        taps, offs = 2, jnp.arange(0, 2)
        base = jnp.floor(coords)
    else:  # bicubic
        taps, offs = 4, jnp.arange(-1, 3)
        base = jnp.floor(coords)
    t = coords - base  # (out,)
    idx = base[:, None].astype(jnp.int32) + offs[None, :]  # (out, taps)
    if bounds is None:
        idx = jnp.clip(idx, 0, n - 1)
    else:
        lo, hi = bounds
        idx = jnp.clip(idx, lo.astype(jnp.int32), hi.astype(jnp.int32))
    if method == "bilinear":
        w = jnp.stack([1.0 - t, t], axis=-1)
    else:
        d = t[:, None] - offs[None, :].astype(jnp.float32)
        a = -0.75
        ad = jnp.abs(d)
        w = jnp.where(
            ad <= 1.0, (a + 2.0) * ad ** 3 - (a + 3.0) * ad ** 2 + 1.0,
            jnp.where(ad < 2.0, a * ad ** 3 - 5 * a * ad ** 2 + 8 * a * ad - 4 * a, 0.0))
    gathered = jnp.take(x, idx.reshape(-1), axis=axis)
    new_shape = list(x.shape)
    new_shape[axis:axis + 1] = [idx.shape[0], taps]
    gathered = gathered.reshape(new_shape)
    w_shape = [1] * gathered.ndim
    w_shape[axis], w_shape[axis + 1] = idx.shape[0], taps
    return jnp.sum(gathered * w.reshape(w_shape), axis=axis + 1)


def crop_resize(x, apex, out_hw=None, method: str = "bilinear"):
    """Crop window `apex=(h0,h1,w0,w1)` (pixels, traced floats OK) and resample
    to `out_hw` (default: input size) — the fused equivalent of the reference's
    crop-then-`F.interpolate`-back attack (noise_layers/crop.py:32-52).

    x: (..., H, W, C); apex shared across the batch (as in the reference,
    which draws one rectangle per call).
    """
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw if out_hw is not None else (h, w)
    h0, h1, w0, w1 = [jnp.asarray(v, jnp.float32) for v in apex]
    ch, cw = h1 - h0, w1 - w0
    # Half-pixel centers inside the crop, mapped back to source coordinates.
    ys = h0 + (jnp.arange(oh, dtype=jnp.float32) + 0.5) * ch / oh - 0.5
    xs = w0 + (jnp.arange(ow, dtype=jnp.float32) + 0.5) * cw / ow - 0.5
    x = _sample_axis(x, ys, axis=x.ndim - 3, method=method, bounds=(h0, h1 - 1))
    x = _sample_axis(x, xs, axis=x.ndim - 2, method=method, bounds=(w0, w1 - 1))
    return x
