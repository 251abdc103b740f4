"""Host-side tamper-mask generation.

`free_form_stroke_mask` re-creates the free-form brush generator
(models/IRNcrop_model.py:932-978 `generate_stroke_mask`/`np_free_form_mask`):
random polylines with thick round caps, accumulated until the mask covers a
target area fraction. The reference runs this *inside* the train step on CPU;
here it runs in the data pipeline (it only depends on the RNG, not on any
device tensor — hoisting is semantics-preserving, SURVEY.md §7).
"""

import numpy as np
import cv2


def free_form_stroke_mask(rng: np.random.Generator, size, max_vertex=4,
                          percent_range=(0.2, 0.3)):
    h, w = size
    max_length = int(h / 5)
    max_brush = int(h / 5)
    mask = np.zeros((h, w), dtype=np.float32)
    lo, hi = percent_range
    target = lo + (hi - lo) * rng.random()
    while True:
        mask = np.minimum(mask + _one_stroke(rng, h, w, max_vertex, max_length,
                                             max_brush), 1.0)
        if mask.mean() >= target:
            break
    return mask


def _one_stroke(rng, h, w, max_vertex, max_length, max_brush):
    mask = np.zeros((h, w), dtype=np.float32)
    num_vertex = int(rng.integers(1, max_vertex + 1))
    y = int(rng.integers(h))
    x = int(rng.integers(w))
    brush = 8
    # the reference draws in [8, max]; clamp the floor so images smaller than
    # 40px (max = size/5 < 8) still work
    lo_len = min(8, max(1, max_length))
    lo_brush = min(8, max(2, max_brush))
    for i in range(num_vertex):
        angle = rng.integers(0, 361) / 360.0 * 2 * np.pi
        if i % 2 == 0:
            angle = 2 * np.pi - angle
        length = int(rng.integers(lo_len, max_length + 1))
        brush = max(2, int(rng.integers(lo_brush, max_brush + 1)) // 2 * 2)
        ny = int(np.clip(y + length * np.cos(angle), 0, h - 1))
        nx = int(np.clip(x + length * np.sin(angle), 0, w - 1))
        cv2.line(mask, (y, x), (ny, nx), 1.0, brush)
        cv2.circle(mask, (y, x), brush // 2, 1.0, -1)
        y, x = ny, nx
    cv2.circle(mask, (y, x), brush // 2, 1.0, -1)
    return mask


def random_rect_mask(rng: np.random.Generator, size, min_rate=0.1, max_rate=0.4):
    """Axis-aligned rectangular tamper mask (splice-style)."""
    h, w = size
    hr = min_rate + (max_rate - min_rate) * rng.random()
    wr = min_rate + (max_rate - min_rate) * rng.random()
    ch, cw = max(1, int(hr * h)), max(1, int(wr * w))
    y0 = int(rng.integers(0, h - ch + 1))
    x0 = int(rng.integers(0, w - cw + 1))
    mask = np.zeros((h, w), dtype=np.float32)
    mask[y0:y0 + ch, x0:x0 + cw] = 1.0
    return mask
