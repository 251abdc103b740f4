"""Core tensor/image ops (TPU-first, NHWC).

Re-implements — as pure jittable functions — the math primitives the reference
scatters across `noise_layers/jpeg.py`, `utils/JPEG.py`,
`models/modules/Quantization.py`, `models/networks.py:536-557` and
`noise_layers/*`: color transforms (all three coefficient sets), 8×8 blockwise
DCT/IDCT as MXU matmuls, straight-through quantization, clamp-with-grad,
matmul-based separable resize, gaussian/median filters, Haar wavelet lifting,
and symmetric padding.
"""

from .color import (
    rgb_to_y_bt601,
    rgb_to_yuv_jpegbasic, yuv_to_rgb_jpegbasic,
    rgb_to_ycbcr_diffjpeg, ycbcr_to_rgb_diffjpeg,
    rgb_to_yuv_analog, yuv_to_rgb_analog,
)
from .dct import dct8x8, idct8x8, block_split, block_merge, DCT8
from .quantize import (
    ste_quantize_255, clamp_with_grad, diff_round, round_only_at_0,
    jpeg_scale_factor, quality_to_factor,
)
from .resize import resize_bilinear, resize_bicubic, resize_matrix, crop_resize
from .filters import (
    gaussian_kernel_2d, gaussian_blur, median_blur, avg_pool_2x2,
    SRM_FILTERS, srm_conv, bayar_constrain,
)
from .haar import haar_downsample, haar_upsample
from .morphology import dilate, erode, opening, closing
from .pad import symm_pad, reflect_index
