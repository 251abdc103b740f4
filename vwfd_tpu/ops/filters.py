"""Spatial filters: gaussian blur, median blur, 2×2 avg pool, SRM/Bayar convs.

All operate on NHWC (or any (..., H, W, C)) arrays. Depthwise small-kernel
filters are written as shift-and-add over static offsets, which XLA fuses into
a handful of VPU ops — no gather, no dynamic shapes.
"""

import functools
import math
import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def gaussian_kernel_2d(kernel_size: int = 3, sigma: float = 2.0):
    """Normalized 2-D gaussian (reference: noise_layers/gaussian_blur.py:17-41)."""
    ax = np.arange(kernel_size) - (kernel_size - 1) / 2.0
    xx, yy = np.meshgrid(ax, ax, indexing="ij")
    k = np.exp(-(xx ** 2 + yy ** 2) / (2.0 * sigma ** 2)) / (2.0 * math.pi * sigma ** 2)
    k = k / k.sum()
    return k.astype(np.float32)  # numpy: safe to lru_cache under traces


def _shifts(x, k):
    """Yield (dy, dx, shifted_view) over a k×k neighbourhood with zero
    padding. STATIC slices on purpose: a dynamic_slice transposes to a
    dynamic-update-slice in the backward (~0.44 ms each at (64,256,256,3)
    on v5e) where a static slice transposes to a fusable zero-pad."""
    pad = k // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 3) + [(pad, pad), (pad, pad), (0, 0)])
    h, w = x.shape[-3], x.shape[-2]
    for dy in range(k):
        for dx in range(k):
            yield dy, dx, xp[..., dy:dy + h, dx:dx + w, :]


def gaussian_blur(x, kernel_size: int = 3, sigma: float = 2.0):
    """Depthwise gaussian blur, zero padding — matches GaussianBlur.forward
    (noise_layers/gaussian_blur.py:43-55: conv2d with padding=(k-1)/2)."""
    k = gaussian_kernel_2d(kernel_size, sigma)
    out = jnp.zeros_like(x)
    for dy, dx, v in _shifts(x, kernel_size):
        out = out + k[dy, dx] * v
    return out


def _median_views(x, kernel_size):
    """The k² shifted neighbourhoods of x under reflect padding, as STATIC
    slices (a dynamic_slice here would transpose to dynamic-update-slice in
    the backward — ~0.44 ms/op on v5e at (64,256,256,3) — where a static
    slice transposes to a fusable zero-pad)."""
    pad = kernel_size // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 3) + [(pad, pad), (pad, pad), (0, 0)],
                 mode="reflect")
    h, w = x.shape[-3], x.shape[-2]
    return [xp[..., dy:dy + h, dx:dx + w, :]
            for dy in range(kernel_size) for dx in range(kernel_size)]


# Paeth median-of-9 sorting-network schedule (19 min/max swaps)
_PAETH_SWAPS = ((1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2),
                (4, 5), (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4),
                (2, 5), (4, 7), (4, 2), (6, 4), (4, 2))


def _median3_net(views):
    v = list(views)
    for i, j in _PAETH_SWAPS:
        lo = jnp.minimum(v[i], v[j])
        hi = jnp.maximum(v[i], v[j])
        v[i], v[j] = lo, hi
    return v[4]


@jax.custom_vjp
def _median3(x):
    return _median3_net(_median_views(x, 3))


def _median3_fwd(x):
    m = _median3_net(_median_views(x, 3))
    return m, (x, m)


def _median3_bwd(res, g):
    """Route each output cotangent to the input pixel that supplied the
    median. The sorting network only reorders values, so the median equals
    one of the 9 views bit-exactly; the first-match mask is one-hot per
    pixel (ties broken in raster-offset order — an arbitrary-but-valid
    subgradient choice, same class as autodiff's min/max tie-breaking, and
    identical to it whenever the 9 values are distinct). Autodiff of the 19
    min/max swaps instead materializes a chain of pred-mask selects: ~9 ms
    per train step at (64,256,256,3) on v5e vs ~1.5 ms for this rule."""
    x, m = res
    views = _median_views(x, 3)
    claimed = jnp.zeros(m.shape, bool)
    hits = []
    for v in views:
        h = (v == m) & ~claimed
        hits.append(h.astype(g.dtype))
        claimed = claimed | h

    def lin(y):
        out = jnp.zeros_like(m)
        for h, v in zip(hits, _median_views(y, 3)):
            out = out + h * v
        return out

    gx, = jax.linear_transpose(lin, x)(g)
    return (gx,)


_median3.defvjp(_median3_fwd, _median3_bwd)


def median_blur(x, kernel_size: int = 3):
    """Depthwise median filter — matches kornia MedianBlur((k,k)) used at
    noise_layers/middle_filter.py:5-13 (reflect padding).

    k=3 uses the Paeth median-of-9 min/max network: 19 elementwise min/max on
    the VPU instead of `jnp.sort`, which lowers to a bitonic sort and costs
    ~10× more on TPU (28 ms vs ~3 ms for a (64,256,256,3) batch on v5e) —
    with a custom VJP (`_median3_bwd`) that replaces the network's autodiff
    with direct median-contributor routing."""
    if kernel_size == 3:
        return _median3(x)
    views = _median_views(x, kernel_size)
    stack = jnp.stack(views, axis=-1)  # (..., H, W, C, k*k)
    return jnp.sort(stack, axis=-1)[..., (kernel_size * kernel_size) // 2]


def avg_pool_2x2(x):
    """2×2 average pool stride 2 on (..., H, W, C) — chroma subsampling
    (utils/JPEG.py:139-160)."""
    *lead, h, w, c = x.shape
    x = x.reshape(*lead, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(-4, -2))


# SRM noise-residual filter bank (public MantraNet initialization; the
# reference loads the same 9×(3ch→)5×5 bank from `MantraNetv4.pt` at
# models/networks.py:909). Three kernels, each applied to each RGB channel.
_SRM_KV = np.array([
    [-1, 2, -2, 2, -1],
    [2, -6, 8, -6, 2],
    [-2, 8, -12, 8, -2],
    [2, -6, 8, -6, 2],
    [-1, 2, -2, 2, -1],
], dtype=np.float32) / 12.0
_SRM_LAP = np.zeros((5, 5), dtype=np.float32)
_SRM_LAP[1:4, 1:4] = np.array([[-1, 2, -1], [2, -4, 2], [-1, 2, -1]]) / 4.0
_SRM_DOT = np.zeros((5, 5), dtype=np.float32)
_SRM_DOT[2, 1:4] = np.array([1, -2, 1]) / 2.0

SRM_FILTERS = jnp.asarray(np.stack([_SRM_KV, _SRM_LAP, _SRM_DOT]))  # (3, 5, 5)


def srm_conv(x):
    """Fixed SRM residual extraction: (..., H, W, 3) → (..., H−4, W−4, 9).

    Each of the 3 SRM kernels convolves each input channel ('valid' padding,
    matching `nn.Conv2d(3, 9, 5, padding=0)` at models/networks.py:907-909).
    """
    outs = []
    h, w = x.shape[-3] - 4, x.shape[-2] - 4
    for f in range(3):
        k = SRM_FILTERS[f]
        acc = jnp.zeros(x.shape[:-3] + (h, w, x.shape[-1]), dtype=x.dtype)
        for dy in range(5):
            for dx in range(5):
                acc = acc + k[dy, dx] * x[..., dy:dy + h, dx:dx + w, :]
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)


def bayar_constrain(w):
    """Apply the Bayar constraint to a (5,5,Cin,Cout) kernel *functionally*
    (the reference mutates weights in-place every forward, networks.py:1058-1061):
    center tap zeroed, remaining taps normalized to sum 1, center set to −1.
    """
    mask = jnp.ones((5, 5) + (1,) * (w.ndim - 2), dtype=w.dtype).at[2, 2].set(0.0)
    w = w * mask
    w = w / jnp.sum(w, axis=(0, 1), keepdims=True)
    return w.at[2, 2].set(-1.0)
