"""Color-space transforms (NHWC, channel-last matmuls → MXU-friendly).

The reference uses *three* distinct RGB↔YUV coefficient sets; all three are
reproduced here because different attack layers rely on different ones:

1. "jpegbasic"  — `noise_layers/jpeg.py:147-163` (Jpeg/JpegSS/JpegMask).
2. "diffjpeg"   — `utils/JPEG.py:115-135, 408-428` (DiffJPEG; ITU JPEG matrix
                  with a +[0,128,128] shift).
3. "analog"     — `noise_layers/jpeg_compression.py:52-63` (HiDDeN-style
                  BT.601 analog YUV).

All functions take/return `(..., 3)` arrays; the per-pixel 3×3 transform is
expressed as a single `x @ M^T (+ shift)` so XLA maps it onto the MXU and can
fuse it with the neighbouring DCT matmuls.
"""

import jax
import jax.numpy as jnp

# --- set 1: noise_layers/jpeg.py ----------------------------------------------
_M_RGB2YUV_JPEGBASIC = jnp.array([
    [0.299, 0.587, 0.114],
    [-0.1687, -0.3313, 0.5],
    [0.5, -0.4187, -0.0813],
], dtype=jnp.float32)

_M_YUV2RGB_JPEGBASIC = jnp.array([
    [1.0, 0.0, 1.40198758],
    [1.0, -0.344113281, -0.714103821],
    [1.0, 1.77197812, 0.0],
], dtype=jnp.float32)

# --- set 2: utils/JPEG.py (DiffJPEG) ------------------------------------------
_M_RGB2YCBCR_DIFFJPEG = jnp.array([
    [0.299, 0.587, 0.114],
    [-0.168736, -0.331264, 0.5],
    [0.5, -0.418688, -0.081312],
], dtype=jnp.float32)
_SHIFT_DIFFJPEG = jnp.array([0.0, 128.0, 128.0], dtype=jnp.float32)

_M_YCBCR2RGB_DIFFJPEG = jnp.array([
    [1.0, 0.0, 1.402],
    [1.0, -0.344136, -0.714136],
    [1.0, 1.772, 0.0],
], dtype=jnp.float32)

# --- set 3: noise_layers/jpeg_compression.py (analog BT.601) ------------------
_M_RGB2YUV_ANALOG = jnp.array([
    [0.299, 0.587, 0.114],
    [-0.14713, -0.28886, 0.436],
    [0.615, -0.51499, -0.10001],
], dtype=jnp.float32)

_M_YUV2RGB_ANALOG = jnp.array([
    [1.0, 0.0, 1.13983],
    [1.0, -0.39465, -0.58060],
    [1.0, 2.03211, 0.0],
], dtype=jnp.float32)


def _apply(x, m):
    # precision=HIGHEST: these 3×3 contractions are numerically load-bearing
    # (JPEG parity); default matmul precision would run them at bf16 on TPU.
    return jnp.einsum("...c,oc->...o", x, m, precision=jax.lax.Precision.HIGHEST)


def rgb_to_yuv_jpegbasic(x):
    """RGB→YUV with the Jpeg/JpegSS/JpegMask coefficients (jpeg.py:147-155)."""
    return _apply(x, _M_RGB2YUV_JPEGBASIC)


def yuv_to_rgb_jpegbasic(x):
    """YUV→RGB inverse used by Jpeg/JpegSS/JpegMask (jpeg.py:157-163)."""
    return _apply(x, _M_YUV2RGB_JPEGBASIC)


def rgb_to_ycbcr_diffjpeg(x):
    """RGB→YCbCr with +128 chroma shift (utils/JPEG.py:115-135). Input scale [0,255]."""
    return _apply(x, _M_RGB2YCBCR_DIFFJPEG) + _SHIFT_DIFFJPEG


def ycbcr_to_rgb_diffjpeg(x):
    """YCbCr→RGB, undoing the +128 chroma shift (utils/JPEG.py:408-428)."""
    return _apply(x - _SHIFT_DIFFJPEG, _M_YCBCR2RGB_DIFFJPEG)


def rgb_to_yuv_analog(x):
    """RGB→YUV, analog BT.601 (jpeg_compression.py:52-58)."""
    return _apply(x, _M_RGB2YUV_ANALOG)


def yuv_to_rgb_analog(x):
    """YUV→RGB, analog BT.601 inverse (jpeg_compression.py:60-63)."""
    return _apply(x, _M_YUV2RGB_ANALOG)


def rgb_to_y_bt601(x01):
    """Y channel of the BT.601 'video range' YCbCr used by the reference's
    Y-channel PSNR/SSIM eval (data/util.py:180-205 `bgr2ycbcr`):
    Y = 16 + (65.481 R + 128.553 G + 24.966 B), inputs in [0,1]."""
    r, g, b = x01[..., 0], x01[..., 1], x01[..., 2]
    return (16.0 + 65.481 * r + 128.553 * g + 24.966 * b) / 255.0
