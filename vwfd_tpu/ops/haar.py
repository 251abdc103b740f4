"""Haar wavelet lifting as reshapes + adds (no convs needed on TPU).

The reference realizes these as grouped stride-2 (transposed) convolutions
with a fixed ±1 filter bank (models/invertible_net.py:178-292). On TPU the
same transform is a 2×2 space-to-depth followed by 4 adds — pure VPU work
that XLA fuses into the surrounding coupling blocks.

Channel layout matches the reference's grouped conv exactly: output channel
`c*4 + k` holds band `k ∈ {LL, LH, HL, HH}` of input channel `c`, scaled by
0.5 in both directions (fac_fwd = fac_rev = 0.5), so `up(down(x)) == x`.
"""

import jax.numpy as jnp


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
