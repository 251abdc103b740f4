"""Space↔depth squeezes expressed as fixed permutation convolutions.

`x.reshape(b, h/2, 2, w/2, 2, c).transpose(...)` is the natural JAX spelling
of space-to-depth, but on TPU every such reshape+transpose forces an XLA
layout round-trip ("data formatting" copies) between the surrounding
convolutions — the r3 embed profile shows these copies dominating the INN's
device time. The SAME permutation expressed as a stride-2 convolution with a
fixed 0/1 kernel keeps tensors in conv-native layouts end to end; the extra
MACs are permutation-sparse and vanish against the copy time they replace.

Channel order matches the reshape spelling exactly: space-to-depth output
channel `(2·p + q)·C + c` holds input channel `c` at sub-pixel (row p,
col q); depth-to-space is its exact inverse. Used by
`nets/inn.py::ResSubnetTPUS2` and `nets/unet.py::UNetTPU`.
"""

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=None)
def _s2d_kernel(c: int, s: int, dtype: str, transpose: bool):
    w = np.zeros((s, s, c, s * s * c), np.float32)
    for p in range(s):
        for q in range(s):
            for ci in range(c):
                w[p, q, ci, (p * s + q) * c + ci] = 1.0
    if transpose:
        # HWIO with I = s²C, O = C; spatially flipped for lax.conv_transpose
        w = w.transpose(0, 1, 3, 2)[::-1, ::-1]
    return jnp.asarray(w, dtype)


def _flatten_lead(x):
    *lead, h, w, c = x.shape
    n = 1
    for d in lead:
        n *= d
    return x.reshape(n, h, w, c), lead, h, w, c


def space_to_depth_conv(x, s: int = 2):
    """(..., H, W, C) → (..., H/s, W/s, s²C) as a fixed stride-s conv."""
    x4, lead, h, w, c = _flatten_lead(x)
    out = lax.conv_general_dilated(
        x4, _s2d_kernel(c, s, str(x.dtype), False), window_strides=(s, s),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        # default conv precision truncates f32 inputs to bf16; a permutation
        # must stay exact (HIGHEST is free when the input is already bf16)
        precision=lax.Precision.HIGHEST)
    return out.reshape(*lead, h // s, w // s, s * s * c)


def depth_to_space_conv(x, s: int = 2):
    """(..., H, W, s²C) → (..., sH, sW, C) — exact inverse of
    `space_to_depth_conv`, as a fixed stride-s transposed conv."""
    x4, lead, h, w, c_full = _flatten_lead(x)
    c = c_full // (s * s)
    out = lax.conv_transpose(
        x4, _s2d_kernel(c, s, str(x.dtype), True), strides=(s, s),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST)
    return out.reshape(*lead, h * s, w * s, c)
