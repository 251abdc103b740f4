"""Binary mask morphology — dilate / erode / open / close.

Reference: noise_layers/__init__.py:24-81 (`Morphology_Dilate`/`_Erode`/
`_Closing`/`_Opening`): a cross-shaped structuring element of the 4
neighbors (center EXCLUDED — `MF = [[0,1,0],[1,0,1],[0,1,0]]`), edge
padding, iterated `time` steps, on 0/255 uint8 masks. Dilate sets a pixel
when ANY 4-neighbor is set; erode clears it unless ALL 4 neighbors are set.

TPU re-design: masks live in [0,1] float, shape (..., H, W) or
(..., H, W, 1); each iteration is four `jnp.roll`-free shifted slices of an
edge-padded array reduced with max/min — pure vector ops, vmappable and
jittable, no Python pixel loops. (The reference's `range(1, H)` loop bounds
silently skip row/col 0 — a loop-bug we do not copy; the full image is
processed here.)
"""

import jax.numpy as jnp


def _neighbors4(x):
    """The 4 cross-neighbors of every pixel, edge-padded, stacked on axis 0.
    x: (..., H, W)."""
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(x, pad, mode="edge")
    up = p[..., :-2, 1:-1]
    down = p[..., 2:, 1:-1]
    left = p[..., 1:-1, :-2]
    right = p[..., 1:-1, 2:]
    return jnp.stack([up, down, left, right], axis=0)


def _spatialize(fn):
    """Apply a (..., H, W) op to masks that may carry a trailing channel."""
    def wrapped(mask, iterations=1):
        squeeze = mask.ndim >= 3 and mask.shape[-1] == 1
        x = mask[..., 0] if squeeze else mask
        for _ in range(int(iterations)):
            x = fn(x)
        return x[..., None] if squeeze else x
    return wrapped


@_spatialize
def dilate(x):
    """Pixel → 1 when any 4-neighbor is set (noise_layers/__init__.py:25-42)."""
    return jnp.maximum(x, jnp.max(_neighbors4(x), axis=0))


@_spatialize
def erode(x):
    """Pixel → 0 unless all 4 neighbors are set (noise_layers/__init__.py:46-64)."""
    return jnp.minimum(x, jnp.min(_neighbors4(x), axis=0))


def closing(mask, iterations: int = 1):
    """Dilate then erode (noise_layers/__init__.py:68-72)."""
    return erode(dilate(mask, iterations), iterations)


def opening(mask, iterations: int = 1):
    """Erode then dilate (noise_layers/__init__.py:76-81)."""
    return dilate(erode(mask, iterations), iterations)
