"""Symmetric (half-sample reflect) padding.

Reproduces `symm_pad`/`reflect` from models/networks.py:536-557 (also
models/IRNcrop_model.py:298-318) but with the index math precomputed in numpy
at trace time — the pad amounts are static, so this lowers to a single gather
(or, for small pads, concatenation of slices) with no host round-trip.
"""

import numpy as np
import jax.numpy as jnp


def reflect_index(x: np.ndarray, minx: float, maxx: float) -> np.ndarray:
    """Triangular-wave reflection of index array `x` into [minx, maxx]
    (networks.py:548-557)."""
    rng = maxx - minx
    double_rng = 2 * rng
    mod = np.fmod(x - minx, double_rng)
    normed_mod = np.where(mod < 0, mod + double_rng, mod)
    out = np.where(normed_mod >= rng, double_rng - normed_mod, normed_mod) + minx
    return np.array(out, dtype=np.int64)


def symm_pad(im, padding):
    """Symmetric-pad (..., H, W, C) by (left, right, top, bottom)."""
    left, right, top, bottom = padding
    h, w = im.shape[-3], im.shape[-2]
    x_idx = np.arange(-left, w + right)
    y_idx = np.arange(-top, h + bottom)
    x_pad = reflect_index(x_idx, -0.5, w - 0.5)
    y_pad = reflect_index(y_idx, -0.5, h - 0.5)
    return im[..., y_pad[:, None], x_pad[None, :], :]
