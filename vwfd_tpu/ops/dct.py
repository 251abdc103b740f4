"""8×8 blockwise DCT-II / IDCT as batched MXU matmuls.

The reference implements this three ways (per-block matmul in
`noise_layers/jpeg.py:115-145`, 4-D tensordot in `utils/JPEG.py:185-208,
332-354`, and 64-filter strided conv in `noise_layers/jpeg_compression.py`).
All are the same orthonormal 2-D DCT; here it is one implementation:
reshape to 8×8 blocks and contract with the orthonormal DCT matrix twice —
`C @ block @ C^T` — which XLA tiles directly onto the MXU.
"""

import functools
import numpy as np
import jax
import jax.numpy as jnp


def _dct_matrix(n: int = 8) -> np.ndarray:
    """Orthonormal DCT-II matrix: C[0,:]=sqrt(1/n); C[i,j]=sqrt(2/n)cos(πi(2j+1)/2n)."""
    c = np.zeros((n, n), dtype=np.float64)
    c[0, :] = np.sqrt(1.0 / n)
    for i in range(1, n):
        for j in range(n):
            c[i, j] = np.cos(np.pi * i * (2 * j + 1) / (2 * n)) * np.sqrt(2.0 / n)
    return c


DCT8 = jnp.asarray(_dct_matrix(8), dtype=jnp.float32)


@functools.lru_cache(maxsize=None)
def _blockdiag_dct(n: int) -> np.ndarray:
    """I_{n/8} ⊗ C8 — the blockwise DCT as one dense (n, n) operator.

    32× redundant FLOPs at n=256, but it turns thousands of MXU-hostile 8×8
    matmuls into two large GEMMs; on TPU that is a large net win (the 8×8
    einsum path leaves the systolic array ~1% utilized)."""
    return np.kron(np.eye(n // 8, dtype=np.float32),
                   _dct_matrix(8).astype(np.float32))


def block_split(x, k: int = 8):
    """(..., H, W) → (..., H/k, W/k, k, k) block view."""
    *lead, h, w = x.shape
    x = x.reshape(*lead, h // k, k, w // k, k)
    return jnp.moveaxis(x, -3, -2)  # (..., h/k, w/k, k, k)


def block_merge(x):
    """(..., H/k, W/k, k, k) → (..., H, W)."""
    *lead, hb, wb, k, k2 = x.shape
    x = jnp.moveaxis(x, -2, -3)  # (..., hb, k, wb, k)
    return x.reshape(*lead, hb * k, wb * k)


def dct8x8(x, center: bool = False, precision=None):
    """Blockwise 2-D DCT of a (..., H, W) array (H, W multiples of 8).

    `center=True` subtracts 128 first (utils/JPEG.py:204 semantics);
    `center=False` matches noise_layers/jpeg.py:115-129.
    """
    if center:
        x = x - 128.0
    h, w = x.shape[-2], x.shape[-1]
    dh, dw = _blockdiag_dct(h), _blockdiag_dct(w)
    prec = precision if precision is not None else jax.lax.Precision.HIGHEST
    out = jnp.einsum("ij,...jk->...ik", dh, x,
                     preferred_element_type=jnp.float32, precision=prec)
    out = jnp.einsum("...ik,lk->...il", out, dw,
                     preferred_element_type=jnp.float32, precision=prec)
    return out


def idct8x8(x, center: bool = False, precision=None):
    """Inverse blockwise 2-D DCT; `center=True` adds 128 back.
    `precision=None` → HIGHEST (golden parity); attack pools pass DEFAULT
    (bf16 MXU passes — the distortion layer tolerates it, ~3-6x faster)."""
    h, w = x.shape[-2], x.shape[-1]
    dh, dw = _blockdiag_dct(h), _blockdiag_dct(w)
    prec = precision if precision is not None else jax.lax.Precision.HIGHEST
    out = jnp.einsum("ji,...jk->...ik", dh, x,
                     preferred_element_type=jnp.float32, precision=prec)
    out = jnp.einsum("...ik,kl->...il", out, dw,
                     preferred_element_type=jnp.float32, precision=prec)
    if center:
        out = out + 128.0
    return out
