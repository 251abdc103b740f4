"""Block-layout Haar DWT/IWT (network/common.py:32-66 `dwt_init`/`iwt_init`).

Differs from ops/haar.py in band *layout* (all-LL channels first, then HL,
LH, HH — not interleaved per input channel) and in sign convention; kept
separate because the wavelet nets (mwnet BSR, SRMNet variants) stack channels
in this block order. NHWC, pure reshape+adds.
"""

import jax.numpy as jnp


def dwt(x):
    """(..., H, W, C) → (..., H/2, W/2, 4C), bands [LL | HL | LH | HH]."""
    x1 = x[..., 0::2, 0::2, :] / 2  # even row, even col
    x2 = x[..., 1::2, 0::2, :] / 2  # odd row,  even col
    x3 = x[..., 0::2, 1::2, :] / 2  # even row, odd col
    x4 = x[..., 1::2, 1::2, :] / 2  # odd row,  odd col
    ll = x1 + x2 + x3 + x4
    hl = -x1 - x2 + x3 + x4
    lh = -x1 + x2 - x3 + x4
    hh = x1 - x2 - x3 + x4
    return jnp.concatenate([ll, hl, lh, hh], axis=-1)


def iwt(x):
    """Exact inverse of `dwt`: (..., H, W, 4C) → (..., 2H, 2W, C)."""
    c = x.shape[-1] // 4
    x1 = x[..., 0 * c:1 * c] / 2
    x2 = x[..., 1 * c:2 * c] / 2
    x3 = x[..., 2 * c:3 * c] / 2
    x4 = x[..., 3 * c:4 * c] / 2
    ee = x1 - x2 - x3 + x4   # even row, even col
    oe = x1 - x2 + x3 - x4   # odd row,  even col
    eo = x1 + x2 - x3 - x4   # even row, odd col
    oo = x1 + x2 + x3 + x4   # odd row,  odd col
    *lead, h, w, _ = ee.shape
    row0 = jnp.stack([ee, eo], axis=-2)          # (..., h, w, 2, c)
    row1 = jnp.stack([oe, oo], axis=-2)
    out = jnp.stack([row0, row1], axis=-4)       # (..., h, 2, w, 2, c)
    return out.reshape(*lead, 2 * h, 2 * w, c)
