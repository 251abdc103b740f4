"""Optical-flow warping — TPU rebuild of `flow_warp`
(models/modules/module_util.py:75-99): sample x at grid + flow with bilinear
or nearest interpolation and zero/border padding, matching
`F.grid_sample(align_corners=True)` semantics on the un-normalized grid.

NHWC layout; gathers are expressed as `jnp.take`-free advanced indexing on a
flattened spatial axis so XLA lowers them to one gather per corner.
"""

import jax.numpy as jnp


def flow_warp(x, flow, interp_mode: str = "bilinear",
              padding_mode: str = "zeros"):
    """x: (B, H, W, C); flow: (B, H, W, 2) with (dx, dy) in PIXELS (the
    reference's `flow[..., 0]` displaces x/width, `[..., 1]` y/height).
    Returns (B, H, W, C) warped with out-of-frame handling per
    `padding_mode` ('zeros' | 'border')."""
    b, h, w, c = x.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=flow.dtype),
                          jnp.arange(w, dtype=flow.dtype), indexing="ij")
    sx = gx[None] + flow[..., 0]
    sy = gy[None] + flow[..., 1]

    if interp_mode == "nearest":
        xi = jnp.round(sx)
        yi = jnp.round(sy)
        out = _gather(x, yi, xi)
        if padding_mode == "zeros":
            valid = ((sx >= -0.5) & (sx <= w - 0.5) &
                     (sy >= -0.5) & (sy <= h - 0.5))
            out = out * valid[..., None].astype(x.dtype)
        return out

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    tx = (sx - x0)[..., None]
    ty = (sy - y0)[..., None]
    v00 = _gather(x, y0, x0)
    v01 = _gather(x, y0, x0 + 1)
    v10 = _gather(x, y0 + 1, x0)
    v11 = _gather(x, y0 + 1, x0 + 1)
    if padding_mode == "zeros":
        v00 = v00 * _inside(y0, x0, h, w)
        v01 = v01 * _inside(y0, x0 + 1, h, w)
        v10 = v10 * _inside(y0 + 1, x0, h, w)
        v11 = v11 * _inside(y0 + 1, x0 + 1, h, w)
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return top * (1 - ty) + bot * ty


def _inside(yi, xi, h, w):
    ok = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
    return ok[..., None].astype(jnp.float32)


def _gather(x, yi, xi):
    b, h, w, c = x.shape
    yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
    xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
    flat = x.reshape(b, h * w, c)
    idx = yi * w + xi  # (B, H, W)
    return jnp.take_along_axis(flat, idx.reshape(b, h * w, 1),
                               axis=1).reshape(b, h, w, c)
