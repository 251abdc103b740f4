"""Differentiable JPEG attacks.

Covers all three JPEG families of the reference:
  * `jpeg_basic` / `jpeg_mask`  — noise_layers/jpeg.py `Jpeg`/`JpegSS`/`JpegMask`
    (no chroma shift, un-centred DCT, std tables scaled by `2−0.02Q | 50/Q`).
  * `diffjpeg`                  — utils/JPEG.py `DiffJPEG` (YCbCr + 128 shift,
    centred DCT, transposed mlomnitz tables, chroma 4:2:0, soft rounding).
  * `hidden_jpeg_mask_compression` — noise_layers/jpeg_compression.py
    (zig-zag keep-count masks per YUV channel).
  * `jpeg_pool` — the fused, traced-parameter pool replacing
    `Combined([...15 jpeg modules...])` (models/IRNcrop_model.py:98-103).
"""

import functools
import numpy as np
import jax
import jax.numpy as jnp

from ..ops import color, dct as dct_ops
from ..ops.quantize import round_only_at_0, diff_round
from ..ops.filters import avg_pool_2x2

# Standard JPEG Annex-K quantization tables (public ISO constants).
_Y_TABLE_NP = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float32)

_C_TABLE_NP = np.full((8, 8), 99, dtype=np.float32)
_C_TABLE_NP[:4, :4] = np.array(
    [[17, 18, 24, 47], [18, 21, 26, 66], [24, 26, 56, 99], [47, 66, 99, 99]],
    dtype=np.float32)

Y_TABLE = jnp.asarray(_Y_TABLE_NP)
C_TABLE = jnp.asarray(_C_TABLE_NP)


def _tile_table(tbl, h, w):
    """Tile an 8×8 table over an (h, w) image grid."""
    return jnp.tile(tbl, (h // 8, w // 8))


def _soft_round(x):
    return round_only_at_0(x)


def jpeg_basic(img, quality=None, *, scale_factor=None, rounding="round",
               subsample: int = 0):
    """Jpeg / JpegSS of noise_layers/jpeg.py:214-273 as one function.

    img: (..., H, W, 3) in [0,1], H and W multiples of 8 (the train path is
    always 256²; generic pad/unpad available via jnp.pad if needed).
    `quality` may be a python float (static) or `scale_factor` a traced array.
    rounding: "round" (Jpeg — STE-free hard round, zero grad through rounding
    like torch.round) or "ss" (JpegSS soft round x³ near 0).
    """
    if scale_factor is None:
        scale_factor = 2.0 - quality * 0.02 if quality >= 50 else 50.0 / quality
    x = img * 255.0
    yuv = color.rgb_to_yuv_jpegbasic(x)
    if subsample == 2:
        # Per-8×8-block 2×2 replication of chroma (jpeg.py:202-211).
        u = yuv[..., 1:3]
        b = dct_ops.block_split(jnp.moveaxis(u, -1, -3))  # (..., 2, h8, w8, 8, 8)
        b = b.at[..., 1::2, :].set(b[..., 0::2, :])
        b = b.at[..., :, 1::2].set(b[..., :, 0::2])
        u = dct_ops.block_merge(b)
        yuv = jnp.concatenate([yuv[..., :1], jnp.moveaxis(u, -3, -1)], axis=-1)
    h, w = x.shape[-3], x.shape[-2]
    coeff = dct_ops.dct8x8(jnp.moveaxis(yuv, -1, -3))  # (..., 3, H, W)
    qy = jnp.clip(jnp.round(Y_TABLE * scale_factor), 1.0, None)
    qc = jnp.clip(jnp.round(C_TABLE * scale_factor), 1.0, None)
    qtbl = jnp.stack([_tile_table(qy, h, w)] + [_tile_table(qc, h, w)] * 2, axis=0)
    scaled = coeff / qtbl
    if rounding == "round":
        rounded = jnp.round(scaled)
    elif rounding == "ss":
        rounded = _soft_round(scaled)
    else:
        raise ValueError(rounding)
    deq = rounded * qtbl
    out = dct_ops.idct8x8(deq)
    rgb = color.yuv_to_rgb_jpegbasic(jnp.moveaxis(out, -3, -1))
    return rgb / 255.0


def jpeg_mask(img, quality=None, **_):
    """JpegMask (noise_layers/jpeg.py:276-306): zonal low-pass in DCT space —
    keep Y 5×5 and chroma 3×3 low frequencies, no quantization. Quality is
    accepted (and ignored) for pool-signature uniformity, as in the reference."""
    x = img * 255.0
    yuv = color.rgb_to_yuv_jpegbasic(x)
    coeff = dct_ops.dct8x8(jnp.moveaxis(yuv, -1, -3))
    my = jnp.zeros((8, 8)).at[:5, :5].set(1.0)
    mc = jnp.zeros((8, 8)).at[:3, :3].set(1.0)
    h, w = x.shape[-3], x.shape[-2]
    mask = jnp.stack([_tile_table(my, h, w)] + [_tile_table(mc, h, w)] * 2, axis=0)
    out = dct_ops.idct8x8(coeff * mask)
    rgb = color.yuv_to_rgb_jpegbasic(jnp.moveaxis(out, -3, -1))
    return rgb / 255.0


# DiffJPEG uses the mlomnitz *transposed* tables (utils/JPEG.py:98-111).
_Y_TABLE_T = jnp.asarray(_Y_TABLE_NP.T)
_C_TABLE_T = jnp.asarray(_C_TABLE_NP.T)


def diffjpeg(img, quality=None, *, factor=None, rounding=round_only_at_0):
    """DiffJPEG (utils/JPEG.py:501-540): 4:2:0 chroma, centred DCT, soft round.

    img: (..., H, W, 3) in [0,1], H/W multiples of 16. `factor` may be traced.
    """
    if factor is None:
        q = quality
        factor = (5000.0 / q if q < 50 else 200.0 - q * 2.0) / 100.0
    x = img * 255.0
    ycc = color.rgb_to_ycbcr_diffjpeg(x)
    y = ycc[..., 0]
    cb = avg_pool_2x2(ycc[..., 1:2])[..., 0]
    cr = avg_pool_2x2(ycc[..., 2:3])[..., 0]

    def comp(chan, tbl):
        c = dct_ops.dct8x8(chan, center=True)
        th, tw = chan.shape[-2], chan.shape[-1]
        t = _tile_table(tbl, th, tw) * factor
        return rounding(c / t) * t

    y = comp(y, _Y_TABLE_T)
    cb = comp(cb, _C_TABLE_T)
    cr = comp(cr, _C_TABLE_T)

    y = dct_ops.idct8x8(y, center=True)
    cb = dct_ops.idct8x8(cb, center=True)
    cr = dct_ops.idct8x8(cr, center=True)
    # chroma upsampling by 2×2 repeat (utils/JPEG.py:380-404)
    cb = jnp.repeat(jnp.repeat(cb, 2, axis=-2), 2, axis=-1)
    cr = jnp.repeat(jnp.repeat(cr, 2, axis=-2), 2, axis=-1)
    ycc = jnp.stack([y, cb, cr], axis=-1)
    rgb = color.ycbcr_to_rgb_diffjpeg(ycc)
    return jnp.clip(rgb, 0.0, 255.0) / 255.0


def jpeg_pool(key, img, qualities=(50, 60, 70, 80, 90)):
    """Fused replacement for `Combined([JpegMask(Q), Jpeg(Q), JpegSS(Q) ∀Q])`
    (models/IRNcrop_model.py:98-103).

    Draws (mode, quality) per call from the 15-member pool; quality enters the
    kernel as a *traced* scale factor and the three rounding modes are blended
    by a one-hot select — so the whole pool is a single compiled program and
    vmaps cleanly over frames.
    """
    k1, k2 = jax.random.split(key)
    qs = jnp.asarray(qualities, dtype=jnp.float32)
    q = qs[jax.random.randint(k1, (), 0, len(qualities))]
    scale = jnp.where(q >= 50, 2.0 - q * 0.02, 50.0 / q)
    mode = jax.random.randint(k2, (), 0, 3)  # 0=hard round, 1=soft, 2=zonal mask

    x = img * 255.0
    yuv = color.rgb_to_yuv_jpegbasic(x)
    prec = jax.lax.Precision.DEFAULT  # attack-pool draw: bf16 MXU passes
    coeff = dct_ops.dct8x8(jnp.moveaxis(yuv, -1, -3), precision=prec)
    h, w = x.shape[-3], x.shape[-2]
    qy = jnp.clip(jnp.round(Y_TABLE * scale), 1.0, None)
    qc = jnp.clip(jnp.round(C_TABLE * scale), 1.0, None)
    qtbl = jnp.stack([_tile_table(qy, h, w)] + [_tile_table(qc, h, w)] * 2, axis=0)
    scaled = coeff / qtbl
    quantized = jnp.where(mode == 0, jnp.round(scaled), _soft_round(scaled)) * qtbl
    my = jnp.zeros((8, 8)).at[:5, :5].set(1.0)
    mc = jnp.zeros((8, 8)).at[:3, :3].set(1.0)
    zmask = jnp.stack([_tile_table(my, h, w)] + [_tile_table(mc, h, w)] * 2, axis=0)
    out_coeff = jnp.where(mode == 2, coeff * zmask, quantized)
    out = dct_ops.idct8x8(out_coeff, precision=prec)
    rgb = color.yuv_to_rgb_jpegbasic(jnp.moveaxis(out, -3, -1))
    return rgb / 255.0


def jpeg_pool_pair(key1, key2, img, w1, w2, qualities=(50, 60, 70, 80, 90)):
    """`w1·jpeg_pool(key1, img) + w2·jpeg_pool(key2, img)` computed exactly but
    with the color transform, blockwise DCT and IDCT run ONCE.

    The flagship video attack mixes two independent draws from the 15-member
    JPEG pool (models/IRNcrop_model.py:357-371 "strong"/"weak" — the same pool,
    :98-103). Quantization is the only nonlinear stage; IDCT is linear and
    YUV→RGB is affine, so mixing the dequantized *coefficients*
    (ĉ = (w1·c1 + w2·c2)/(w1+w2)) and scaling the final RGB by (w1+w2)
    reproduces the weighted sum of the two full pipelines — saving one
    DCT+IDCT+2×color per frame (≈40% of the pool's FLOPs)."""
    x = img * 255.0
    yuv = color.rgb_to_yuv_jpegbasic(x)
    prec = jax.lax.Precision.DEFAULT  # attack-pool draw: bf16 MXU passes
    coeff = dct_ops.dct8x8(jnp.moveaxis(yuv, -1, -3), precision=prec)
    h, w = x.shape[-3], x.shape[-2]
    qs = jnp.asarray(qualities, dtype=jnp.float32)
    my = jnp.zeros((8, 8)).at[:5, :5].set(1.0)
    mc = jnp.zeros((8, 8)).at[:3, :3].set(1.0)
    zmask = jnp.stack([_tile_table(my, h, w)] + [_tile_table(mc, h, w)] * 2,
                      axis=0)

    def draw(key):
        k1, k2 = jax.random.split(key)
        q = qs[jax.random.randint(k1, (), 0, len(qs))]
        scale = jnp.where(q >= 50, 2.0 - q * 0.02, 50.0 / q)
        mode = jax.random.randint(k2, (), 0, 3)
        qy = jnp.clip(jnp.round(Y_TABLE * scale), 1.0, None)
        qc = jnp.clip(jnp.round(C_TABLE * scale), 1.0, None)
        qtbl = jnp.stack([_tile_table(qy, h, w)] + [_tile_table(qc, h, w)] * 2,
                         axis=0)
        scaled = coeff / qtbl
        quantized = jnp.where(mode == 0, jnp.round(scaled),
                              _soft_round(scaled)) * qtbl
        return jnp.where(mode == 2, coeff * zmask, quantized)

    wsum = w1 + w2
    mixed = (w1 * draw(key1) + w2 * draw(key2)) / wsum
    out = dct_ops.idct8x8(mixed, precision=prec)
    rgb = color.yuv_to_rgb_jpegbasic(jnp.moveaxis(out, -3, -1))
    return wsum * rgb / 255.0


def diffjpeg_pool(key, img, qualities=(60, 70, 80, 90)):
    """Fused `Combined([DiffJPEG(90), DiffJPEG(80), DiffJPEG(60), DiffJPEG(70)])`
    (models/IRNcrop_model.py:104): quality enters as a traced factor, so the
    random draw costs no branches."""
    qs = jnp.asarray(qualities, dtype=jnp.float32)
    q = qs[jax.random.randint(key, (), 0, len(qualities))]
    factor = jnp.where(q < 50, 5000.0 / q, 200.0 - q * 2.0) / 100.0
    return diffjpeg(img, factor=factor)


@functools.lru_cache(maxsize=None)
def zigzag_keep_mask(window: int, keep: int, h: int, w: int):
    """Zig-zag keep-count mask tiled over (h, w)
    (noise_layers/jpeg_compression.py:30-43)."""
    mask = np.zeros((window, window), dtype=np.float32)
    order = sorted(((x, y) for x in range(window) for y in range(window)),
                   key=lambda p: (p[0] + p[1], -p[1] if (p[0] + p[1]) % 2 else p[1]))
    for i, j in order[:keep]:
        mask[i, j] = 1
    tiled = np.tile(mask, (int(np.ceil(h / window)), int(np.ceil(w / window))))
    return tiled[:h, :w]  # numpy: lru_cache-safe under traces


def hidden_jpeg_mask_compression(img, yuv_keep=(25, 9, 9)):
    """HiDDeN-style JpegCompression (noise_layers/jpeg_compression.py:66-159):
    analog-YUV transform, blockwise DCT, zig-zag keep masks (25/9/9), IDCT back.
    img: (..., H, W, 3), H/W multiples of 8, any scale (reference feeds [-1,1])."""
    yuv = color.rgb_to_yuv_analog(img)
    coeff = dct_ops.dct8x8(jnp.moveaxis(yuv, -1, -3))
    h, w = img.shape[-3], img.shape[-2]
    mask = jnp.stack([zigzag_keep_mask(8, k, h, w) for k in yuv_keep], axis=0)
    out = dct_ops.idct8x8(coeff * mask)
    return color.yuv_to_rgb_analog(jnp.moveaxis(out, -3, -1))


def jpeg_real(img01, quality: int, subsampling: int = 0):
    """Real libjpeg round trip via PIL — the non-differentiable oracle the
    reference calls `JpegTest` (noise_layers/jpeg.py:10-45). HOST-side only
    (numpy in/out); use in eval paths, never inside jit."""
    import io
    import numpy as np
    from PIL import Image

    x = np.asarray(img01)
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    out = np.empty_like(x)
    for i in range(x.shape[0]):
        u8 = (np.clip(x[i], 0, 1) * 255).round().astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(u8).save(buf, format="JPEG", quality=int(quality),
                                 subsampling=subsampling)
        out[i] = np.asarray(Image.open(buf), np.float32) / 255.0
    return out[0] if squeeze else out
