"""DCT-domain transform zoo — host-side numpy rebuild of the vendored
"learning in the frequency domain" pipeline (datasets/cvtransforms.py:37-1100,
datasets/cvfunctional.py), scoped to the transforms the reference's own
loaders actually compose (datasets/dataloader_imagenet_dct.py:24-37 and the
val variants): Compose, UpsampleCbCr, SubsetDCT/SubsetDCT2,
RandomResizedCropDCT, CenterCropDCT, Aggregate/Aggregate2,
RandomHorizontalFlip/RandomVerticalFlip, ToTensorDCT/ToTensorDCT2,
NormalizeDCT, Resize. The other ~30 classes in the reference file are dead
code (several import `main.subset_channel_index_*`, a module that does not
exist in the repo).

Data model: a DCT item is a tuple (y, cb, cr) of (H/8, W/8, 64) float arrays
(DCTDomainDataset output; chroma at half grid before UpsampleCbCr).

Subset tables: the reference reads square/learned/triangle channel-index
tables from the missing `main` module. We derive them from the block
frequency grid: 'square' = the k×k low-frequency corner (row-major),
'triangle' = the first k indices in zig-zag order, 'learned' falls back to
'triangle' (the published learned masks are close to the zig-zag triangle).
Channel split across Y/Cb/Cr follows the paper's 2:1:1 budget.
"""

import math
import random

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _zigzag_order(n=8):
    order = sorted(((x, y) for x in range(n) for y in range(n)),
                   key=lambda p: (p[0] + p[1],
                                  -p[1] if (p[0] + p[1]) % 2 else p[1]))
    return [x * n + y for x, y in order]


def subset_indices(channels: int, pattern: str = "square"):
    """Per-plane channel indices for a total budget of `channels` (Y:Cb:Cr
    split 2:1:1, each plane's indices in the requested frequency pattern)."""
    cy = (channels + 1) // 2
    cc = (channels - cy) // 2
    cy = channels - 2 * cc

    def pick(k):
        if pattern == "square":
            side = max(1, int(math.ceil(math.sqrt(k))))
            grid = [i * 8 + j for i in range(side) for j in range(side)]
            return sorted(grid[:k])
        # triangle / learned → zig-zag low-frequency prefix
        return sorted(_zigzag_order()[:k])

    return pick(cy), pick(cc), pick(cc)


def _resize_plane(a, hw, interpolation="BILINEAR"):
    h, w = hw
    if cv2 is not None:
        interp = (cv2.INTER_LINEAR if interpolation.upper() == "BILINEAR"
                  else cv2.INTER_CUBIC)
        out = cv2.resize(a, (w, h), interpolation=interp)
        return out if out.ndim == a.ndim else out[..., None]
    ys = np.clip(((np.arange(h) + 0.5) * a.shape[0] / h - 0.5), 0,
                 a.shape[0] - 1)
    xs = np.clip(((np.arange(w) + 0.5) * a.shape[1] / w - 0.5), 0,
                 a.shape[1] - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, a.shape[0] - 1)
    x1 = np.minimum(x0 + 1, a.shape[1] - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    return ((1 - wy) * (1 - wx) * a[y0][:, x0] + (1 - wy) * wx * a[y0][:, x1]
            + wy * (1 - wx) * a[y1][:, x0] + wy * wx * a[y1][:, x1])


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, item):
        for t in self.transforms:
            item = t(item)
        return item


class Lambda:
    def __init__(self, fn):
        self.fn = fn

    def __call__(self, item):
        return self.fn(item)


class UpsampleCbCr:
    """Upscale the chroma coefficient grids to Y's grid
    (cvtransforms.py:249-262)."""

    def __init__(self, upscale_factor=2, interpolation="BILINEAR"):
        self.interpolation = interpolation

    def __call__(self, item):
        y, cb, cr = item
        hw = y.shape[:2]
        return (y, _resize_plane(cb, hw, self.interpolation),
                _resize_plane(cr, hw, self.interpolation))


class SubsetDCT2:
    """Keep a frequency-pattern channel subset per plane
    (cvtransforms.py:472-490)."""

    def __init__(self, channels=24, pattern="square"):
        self.sy, self.scb, self.scr = subset_indices(channels, pattern)

    def __call__(self, item):
        y, cb, cr = item
        return y[:, :, self.sy], cb[:, :, self.scb], cr[:, :, self.scr]


SubsetDCT = SubsetDCT2  # tuple-based variant is identical here (:448-470)


class Aggregate2:
    """Concatenate planes on the channel axis (cvtransforms.py:498-505)."""

    def __call__(self, item):
        return np.concatenate(item, axis=2)


class Aggregate(Aggregate2):
    pass


class RandomResizedCropDCT:
    """Inception-style random resized crop on the DCT coefficient grid
    (cvtransforms.py:1069-1100 over the :992-1056 param logic); `size` is in
    PIXELS, the grid crop is size/8."""

    def __init__(self, size, scale=(0.08, 1.0), ratio=(3. / 4., 4. / 3.),
                 interpolation="BILINEAR"):
        self.size = (size // 8, size // 8)
        self.scale = scale
        self.ratio = ratio
        self.interpolation = interpolation

    def _params(self, shape):
        for _ in range(10):
            area = shape[0] * shape[1]
            target = random.uniform(*self.scale) * area
            ar = random.uniform(*self.ratio)
            w = int(round(math.sqrt(target * ar)))
            h = int(round(math.sqrt(target / ar)))
            if random.random() < 0.5:
                w, h = h, w
            if 0 < w <= shape[1] and 0 < h <= shape[0]:
                i = random.randint(0, shape[0] - h)
                j = random.randint(0, shape[1] - w)
                return i, j, h, w
        s = min(shape[0], shape[1])
        return (shape[0] - s) // 2, (shape[1] - s) // 2, s, s

    def __call__(self, item):
        single = not isinstance(item, (tuple, list))
        planes = (item,) if single else item
        i, j, h, w = self._params(planes[0].shape)
        out = tuple(_resize_plane(p[i:i + h, j:j + w], self.size,
                                  self.interpolation) for p in planes)
        return out[0] if single else out


class CenterCropDCT:
    """Center crop on the coefficient grid (cvtransforms.py:368-399);
    `size` in pixels."""

    def __init__(self, size):
        self.size = size // 8

    def __call__(self, item):
        single = not isinstance(item, (tuple, list))
        planes = (item,) if single else item
        s = self.size
        h, w = planes[0].shape[:2]
        i, j = max(0, (h - s) // 2), max(0, (w - s) // 2)
        out = tuple(p[i:i + s, j:j + s] for p in planes)
        return out[0] if single else out


class Resize:
    """Plain resize of every plane (cvtransforms.py:684-716); `size` is the
    coefficient-grid target here (callers pass pixels//8)."""

    def __init__(self, size, interpolation="BILINEAR"):
        self.size = (size, size) if isinstance(size, int) else size
        self.interpolation = interpolation

    def __call__(self, item):
        single = not isinstance(item, (tuple, list))
        planes = (item,) if single else item
        out = tuple(_resize_plane(p, self.size, self.interpolation)
                    for p in planes)
        return out[0] if single else out


class RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, item):
        if random.random() >= self.p:
            return item
        if isinstance(item, (tuple, list)):
            return tuple(np.ascontiguousarray(p[:, ::-1]) for p in item)
        return np.ascontiguousarray(item[:, ::-1])


class RandomVerticalFlip(RandomHorizontalFlip):
    def __call__(self, item):
        if random.random() >= self.p:
            return item
        if isinstance(item, (tuple, list)):
            return tuple(np.ascontiguousarray(p[::-1]) for p in item)
        return np.ascontiguousarray(item[::-1])


class ToTensorDCT2:
    """HWC float grid → CHW float32 (cvtransforms.py:421-438)."""

    def __call__(self, item):
        return np.ascontiguousarray(item.transpose(2, 0, 1)).astype(np.float32)


class ToTensorDCT:
    def __call__(self, item):
        t = ToTensorDCT2()
        return tuple(t(p) for p in item)


class NormalizeDCT:
    """Per-channel standardization with subset-aware index remapping
    (cvtransforms.py:507-557): when a channel subset is configured, the
    mean/std vectors are indexed by the aggregated Y+64·Cb+128·Cr layout."""

    def __init__(self, mean, std, cb_mean=None, cb_std=None, cr_mean=None,
                 cr_std=None, channels=None, pattern="square"):
        mean, std = np.asarray(mean, np.float32), np.asarray(std, np.float32)
        if channels is not None and channels < 192 and mean.size >= 192:
            sy, scb, scr = subset_indices(channels, pattern)
            idx = list(sy) + [64 + c for c in scb] + [128 + c for c in scr]
            mean, std = mean[idx], std[idx]
        self.mean, self.std = mean, std
        self.cb = (None if cb_mean is None else
                   (np.asarray(cb_mean, np.float32),
                    np.asarray(cb_std, np.float32)))
        self.cr = (None if cr_mean is None else
                   (np.asarray(cr_mean, np.float32),
                    np.asarray(cr_std, np.float32)))

    def _norm(self, t, mean, std):
        return (t - mean[:, None, None]) / std[:, None, None]

    def __call__(self, item):
        if isinstance(item, (tuple, list)):
            y, cb, cr = item
            return (self._norm(y, self.mean, self.std),
                    self._norm(cb, *self.cb), self._norm(cr, *self.cr))
        return self._norm(item, self.mean, self.std)
