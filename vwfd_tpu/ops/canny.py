"""Differentiable edge map (canny approximation) in pure JAX.

The reference computes skimage `canny` on CPU *inside* the train step
(models/IRNclr_model.py:619-626, IRNcrop_model.py:9) — a host↔device round
trip per step that SURVEY.md §3 flags as a perf sink. Input cannys are
precomputed host-side (data/images.py); for the mid-step re-canny of the
*attacked* image we use this on-device approximation: gaussian smoothing →
Sobel gradients → magnitude → soft non-max suppression → soft thresholding.
Produces a [0,1] edge map suitable as the INN's 4th conditioning channel.
"""

import jax
import jax.numpy as jnp

from .filters import gaussian_blur

_GRAY = jnp.asarray([0.299, 0.587, 0.114])


def sobel_edges(gray):
    """(…, H, W, 1) → (gx, gy) with 3×3 Sobel kernels, reflect padding."""
    p = jnp.pad(gray, [(0, 0)] * (gray.ndim - 3) + [(1, 1), (1, 1), (0, 0)],
                mode="reflect")

    def sh(dy, dx):
        # static slices: their transpose is a fusable zero-pad, not a
        # dynamic-update-slice (matters in the image-family backward)
        h, w = gray.shape[-3], gray.shape[-2]
        return p[..., dy + 1:dy + 1 + h, dx + 1:dx + 1 + w, :]

    gx = (sh(-1, 1) + 2 * sh(0, 1) + sh(1, 1)
          - sh(-1, -1) - 2 * sh(0, -1) - sh(1, -1))
    gy = (sh(1, -1) + 2 * sh(1, 0) + sh(1, 1)
          - sh(-1, -1) - 2 * sh(-1, 0) - sh(-1, 1))
    return gx, gy


def canny_soft(img, sigma: float = 1.0, low: float = 0.1, high: float = 0.2,
               sharpness: float = 20.0):
    """Soft (differentiable) canny-style edge map of an RGB (…,H,W,3) image."""
    gray = (img @ _GRAY)[..., None]
    # reflect-pad before smoothing: the attack-layer gaussian_blur zero-pads
    # (its reference does), which would fabricate border edges here
    gp = jnp.pad(gray, [(0, 0)] * (gray.ndim - 3) + [(2, 2), (2, 2), (0, 0)],
                 mode="reflect")
    smooth = gaussian_blur(gp, kernel_size=5, sigma=sigma)[..., 2:-2, 2:-2, :]
    gx, gy = sobel_edges(smooth)
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)
    mag = mag / (jnp.max(mag, axis=(-3, -2, -1), keepdims=True) + 1e-12)

    # soft NMS: suppress pixels weaker than the neighbour along the gradient
    p = jnp.pad(mag, [(0, 0)] * (mag.ndim - 3) + [(1, 1), (1, 1), (0, 0)])
    h, w = mag.shape[-3], mag.shape[-2]

    def sh(dy, dx):
        return p[..., dy + 1:dy + 1 + h, dx + 1:dx + 1 + w, :]

    # direction cosines computed directly (arctan2 has NaN grad at (0,0))
    gnorm = jnp.sqrt(gx * gx + gy * gy + 1e-8)
    c, s = gx / gnorm, gy / gnorm
    # bilinear sample of the two neighbours along ±gradient direction
    n1 = (jnp.abs(c) * (jnp.where(c >= 0, sh(0, 1), sh(0, -1)))
          + jnp.abs(s) * (jnp.where(s >= 0, sh(1, 0), sh(-1, 0))))
    n2 = (jnp.abs(c) * (jnp.where(c >= 0, sh(0, -1), sh(0, 1)))
          + jnp.abs(s) * (jnp.where(s >= 0, sh(-1, 0), sh(1, 0))))
    denom = jnp.abs(c) + jnp.abs(s) + 1e-12
    keep = jax.nn.sigmoid(sharpness * (mag - n1 / denom)) * \
           jax.nn.sigmoid(sharpness * (mag - n2 / denom))
    edge = mag * keep
    # soft double threshold
    return jax.nn.sigmoid(sharpness * (edge - low)) * \
           jnp.clip(edge / high, 0.0, 1.0)
