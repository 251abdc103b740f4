"""Haar wavelet lifting as reshapes + adds (no convs needed on TPU).

The reference realizes these as grouped stride-2 (transposed) convolutions
with a fixed ±1 filter bank (models/invertible_net.py:178-292). On TPU the
same transform is a 2×2 space-to-depth followed by 4 adds — pure VPU work
that XLA fuses into the surrounding coupling blocks.

Channel layout matches the reference's grouped conv exactly: output channel
`c*4 + k` holds band `k ∈ {LL, LH, HL, HH}` of input channel `c`, scaled by
0.5 in both directions (fac_fwd = fac_rev = 0.5), so `up(down(x)) == x`.
"""

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax


def haar_downsample(x):
    """(..., H, W, C) → (..., H/2, W/2, 4C). Bands: ½(a±b±c±d) with the
    reference's sign pattern (invertible_net.py:188-199)."""
    *lead, h, w, c = x.shape
    x = x.reshape(*lead, h // 2, 2, w // 2, 2, c)
    a = x[..., 0, :, 0, :]  # top-left
    b = x[..., 0, :, 1, :]  # top-right
    cc = x[..., 1, :, 0, :]  # bottom-left
    d = x[..., 1, :, 1, :]  # bottom-right
    ll = 0.5 * (a + b + cc + d)
    lh = 0.5 * (a - b + cc - d)
    hl = 0.5 * (a + b - cc - d)
    hh = 0.5 * (a - b - cc + d)
    out = jnp.stack([ll, lh, hl, hh], axis=-1)  # (..., H/2, W/2, C, 4)
    return out.reshape(*lead, h // 2, w // 2, c * 4)


def haar_upsample(x):
    """(..., H, W, 4C) → (..., 2H, 2W, C). Exact inverse of `haar_downsample`."""
    *lead, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(*lead, h, w, c, 4)
    ll, lh, hl, hh = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    a = 0.5 * (ll + lh + hl + hh)
    b = 0.5 * (ll - lh + hl - hh)
    cc = 0.5 * (ll + lh - hl - hh)
    d = 0.5 * (ll - lh - hl + hh)
    row0 = jnp.stack([a, b], axis=-2)    # (..., h, w, 2, c)
    row1 = jnp.stack([cc, d], axis=-2)   # (..., h, w, 2, c)
    out = jnp.stack([row0, row1], axis=-4)  # (..., h, 2, w, 2, c)
    return out.reshape(*lead, h * 2, w * 2, c)


# ---------------------------------------------------------- conv-expressed
# The lifting form above is minimal-FLOPs but its reshape+transpose pattern
# forces XLA:TPU layout round-trips between the surrounding convolutions —
# the r3 pipeline profile shows the embed INN spending over half its device
# time in `data formatting` copies around exactly these squeezes. The conv
# forms below are the SAME linear map expressed as a fixed-weight stride-2
# conv / transposed conv: a few extra (cheap, MXU) FLOPs in exchange for
# tensors that never leave conv-native layouts. Selected inside
# `nets/inn.py::InvertibleNet` via `haar='conv'` (ModelConfig.inn_haar).

# sign of band k ∈ (LL, LH, HL, HH) at sub-pixel (p=row, q=col) — transcribed
# from the lifting arithmetic above (b = col 1, cc = row 1).
_SIGNS = np.array(
    [
        [[1.0, 1.0], [1.0, 1.0]],      # LL =  a + b + c + d
        [[1.0, -1.0], [1.0, -1.0]],    # LH =  a − b + c − d
        [[1.0, 1.0], [-1.0, -1.0]],    # HL =  a + b − c − d
        [[1.0, -1.0], [-1.0, 1.0]],    # HH =  a − b − c + d
    ],
    np.float32,
)


@functools.lru_cache(maxsize=None)
def _haar_kernel(c: int, dtype: str, transpose: bool):
    """(2, 2, C, 4C) HWIO bank (or its (2, 2, 4C, C) inverse) with output
    channel c·4+k = band k of input channel c — the reference's grouped-conv
    channel order (invertible_net.py:188-199)."""
    w = np.zeros((2, 2, c, 4 * c), np.float32)
    for ci in range(c):
        for k in range(4):
            w[:, :, ci, ci * 4 + k] = 0.5 * _SIGNS[k]
    if transpose:
        # HWIO with I = 4C, O = C; spatially flipped because lax.conv_transpose
        # mirrors the kernel relative to the scatter pattern we want
        w = w.transpose(0, 1, 3, 2)[::-1, ::-1]
    return jnp.asarray(w, dtype)


def _flatten_lead(x):
    *lead, h, w, c = x.shape
    n = 1
    for d in lead:
        n *= d
    return x.reshape(n, h, w, c), lead, h, w, c


def haar_downsample_conv(x):
    """`haar_downsample` as a fixed-weight 2×2 stride-2 convolution."""
    x4, lead, h, w, c = _flatten_lead(x)
    out = lax.conv_general_dilated(
        x4, _haar_kernel(c, str(x.dtype), False), window_strides=(2, 2),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        # default conv precision truncates f32 inputs to bf16; the transform
        # must stay exact in f32 (invertibility tests / reference parity) and
        # HIGHEST is free when the flagship already feeds bf16
        precision=lax.Precision.HIGHEST)
    return out.reshape(*lead, h // 2, w // 2, 4 * c)


def haar_upsample_conv(x):
    """`haar_upsample` as a fixed-weight 2×2 stride-2 transposed conv."""
    x4, lead, h, w, c4 = _flatten_lead(x)
    c = c4 // 4
    out = lax.conv_transpose(
        x4, _haar_kernel(c, str(x.dtype), True), strides=(2, 2),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST)
    return out.reshape(*lead, h * 2, w * 2, c)
