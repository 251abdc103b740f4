"""Differentiable attack (distortion) pool — reference: `noise_layers/`, `utils/JPEG.py`.

Every attack is a pure function of `(key, image, ...)` on NHWC images in
[0, 1]; randomness is explicit PRNG threading (the reference uses module-level
`np.random`/`random` inside `forward`, which cannot live under `jit`).

TPU-native re-designs worth noting:
  * `jpeg_pool` — the reference's `Combined([JpegMask(Q), Jpeg(Q), JpegSS(Q)…])`
    random member selection (noise_layers/combined.py:15-20 over 15 modules)
    is ONE parametrized kernel: quality and rounding mode are *traced* values,
    so a fresh random draw per frame costs no recompilation and no branch
    fan-out under `vmap`.
  * `resize_roundtrip` — random-ratio down/up-scale round trip
    (noise_layers/resize.py) is a per-ratio precomputed (H,H) matrix pool;
    a traced ratio index gathers the matrix and the attack is two matmuls.
  * `attack_pool_video` — the flagship 5-way per-frame attack mixture of
    IRNcrop (models/IRNcrop_model.py:350-373) as a single fused computation
    over (B, T, H, W, C).
"""

from .jpeg import (
    Y_TABLE, C_TABLE, jpeg_basic, jpeg_mask, diffjpeg, jpeg_pool,
    diffjpeg_pool, hidden_jpeg_mask_compression, zigzag_keep_mask,
)
from .spatial import (
    resize_roundtrip, make_resize_roundtrip_pool, crop_attack, sample_crop_apex,
    cropout, dropout_mix,
)
from .noise import gaussian_noise, salt_pepper, identity, dropout_pixelwise
from .blur import gaussian_blur_attack, median_blur_attack
from .combined import combined_switch, attack_pool_video, ATTACK_POOL_SIZE
from .stegastamp import (
    random_blur_kernel, apply_blur_kernel, random_perspective,
    random_brightness_hue,
)
