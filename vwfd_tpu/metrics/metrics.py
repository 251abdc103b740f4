"""Quality / localization metrics with the reference's exact semantics.

The subtle parts SURVEY.md §7 flags are kept bit-for-bit:
  * PSNR is computed on images postprocessed with `(x*255).int()` — i.e.
    *truncation toward zero*, not rounding (models/IRNcrop_model.py:660-664),
    and returns 0 (not ∞) when MSE is 0 (metrics.py:30-46).
  * SSIM uses an 11×11 σ=1.5 gaussian window with zero padding
    (pytorch_ssim/__init__.py:7-63).
  * The F1 sweep binarizes at `int(255·t)` on uint8 images and counts pixel
    TN/TP/FN/FP exactly like calculate_f1.py:5-50 — but as one XLA reduction
    over the whole threshold sweep instead of a Python pixel loop.
"""

import functools
import math
import numpy as np
import jax
import jax.numpy as jnp


def postprocess_int(img01):
    """[0,1] float → int-truncated [0,255] ints, as float for math
    (models/IRNcrop_model.py:660-664: `(img*255).permute(...).int()`)."""
    return jnp.trunc(img01 * 255.0)


def psnr(a, b, max_val=255.0):
    """metrics.py:30-46 `PSNR` — inputs already postprocessed; 0 when mse==0."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    mse = jnp.mean((a - b) ** 2)
    val = 20.0 * jnp.log10(max_val) - 10.0 * jnp.log10(mse)
    return jnp.where(mse == 0, 0.0, val)


def psnr255_int(img01_a, img01_b):
    """The composition the reference always uses: postprocess then PSNR(255)."""
    return psnr(postprocess_int(img01_a), postprocess_int(img01_b))


@functools.lru_cache(maxsize=None)
def _ssim_window(window_size: int = 11, sigma: float = 1.5):
    g = np.array([math.exp(-((x - window_size // 2) ** 2) / (2 * sigma ** 2))
                  for x in range(window_size)])
    g = g / g.sum()
    w = np.outer(g, g)
    return w.astype(np.float32)  # numpy: lru_cache-safe under traces


def _depthwise_same_conv(x, k2d):
    """Depthwise 'same' conv with zero padding on (..., H, W, C)."""
    ks = k2d.shape[0]
    pad = ks // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 3) + [(pad, pad), (pad, pad), (0, 0)])
    h, w = x.shape[-3], x.shape[-2]
    out = jnp.zeros_like(x)
    for dy in range(ks):
        for dx in range(ks):
            out = out + k2d[dy, dx] * jax.lax.dynamic_slice_in_dim(
                jax.lax.dynamic_slice_in_dim(xp, dy, h, axis=xp.ndim - 3),
                dx, w, axis=xp.ndim - 2)
    return out


def ssim(img1, img2, window_size: int = 11, size_average: bool = True):
    """Windowed SSIM on NHWC [0,1] images (pytorch_ssim/__init__.py:17-63)."""
    w = _ssim_window(window_size)
    mu1 = _depthwise_same_conv(img1, w)
    mu2 = _depthwise_same_conv(img2, w)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = _depthwise_same_conv(img1 * img1, w) - mu1_sq
    sigma2_sq = _depthwise_same_conv(img2 * img2, w) - mu2_sq
    sigma12 = _depthwise_same_conv(img1 * img2, w) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=tuple(range(1, ssim_map.ndim)))


def edge_accuracy(inputs, outputs, threshold: float = 0.5):
    """(precision, recall) of thresholded masks (metrics.py:5-27)."""
    labels = inputs > threshold
    preds = outputs > threshold
    relevant = jnp.sum(labels.astype(jnp.float32))
    selected = jnp.sum(preds.astype(jnp.float32))
    tp = jnp.sum(((preds == labels) & labels).astype(jnp.float32))
    recall = tp / (relevant + 1e-8)
    precision = tp / (selected + 1e-8)
    both_empty = (relevant == 0) & (selected == 0)
    return (jnp.where(both_empty, 1.0, precision),
            jnp.where(both_empty, 1.0, recall))


def mask_confusion(pred01, gt01, thresh: float):
    """Pixel TN/TP/FN/FP with calculate_f1.py:5-19 semantics.

    Binarization matches `cv2.threshold(img, int(255*t), 255, BINARY)`:
    a uint8 pixel is 'on' iff value > int(255*t).
    """
    t = jnp.floor(255.0 * thresh)
    p = (jnp.trunc(pred01 * 255.0) > t)
    g = (jnp.trunc(gt01 * 255.0) > t)
    tp = jnp.sum((p & g).astype(jnp.float32))
    tn = jnp.sum((~p & ~g).astype(jnp.float32))
    fn = jnp.sum((~p & g).astype(jnp.float32))
    fp = jnp.sum((p & ~g).astype(jnp.float32))
    return tn, tp, fn, fp


def f1_from_confusion(tn, tp, fn, fp):
    return (2 * tp) / (2 * tp + fp + fn + 1e-12)


def mask_scores(pred01, gt01, thresh: float = 0.5):
    """ACC/FPR/TPR/TNR/FNR/F1/BER (calculate_f1.py:24-37)."""
    tn, tp, fn, fp = mask_confusion(pred01, gt01, thresh)
    eps = 1e-12
    return {
        "ACC": (tp + tn) / (tp + fp + fn + tn + eps),
        "FPR": fp / (fp + tn + eps),
        "TPR": tp / (tp + fn + eps),
        "TNR": tn / (fp + tn + eps),
        "FNR": fn / (tp + fn + eps),
        "F1": f1_from_confusion(tn, tp, fn, fp),
        "BER": 0.5 * (fp / (fp + tn + eps) + fn / (fn + tp + eps)),
    }


def f1_sweep(pred01, gt01, thresholds=tuple(np.arange(0.1, 0.95, 0.1))):
    """Threshold sweep 0.1→0.9 (calculate_f1.py:52-72) as one vmapped reduction.
    Returns (thresholds, f1s)."""
    ts = jnp.asarray(thresholds, dtype=jnp.float32)

    def one(t):
        tn, tp, fn, fp = mask_confusion(pred01, gt01, t)
        return f1_from_confusion(tn, tp, fn, fp)

    return ts, jax.vmap(one)(ts)


def bitwise_message_error(decoded, messages):
    """Mean |round(clip(dec,0,1)) − msg| (hidden_models/hidden.py:105-107)."""
    d = jnp.round(jnp.clip(decoded, 0.0, 1.0))
    return jnp.mean(jnp.abs(d - messages))
