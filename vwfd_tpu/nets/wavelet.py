"""Wavelet-domain nets: BSR (network/mwnet.py:36-116) — multi-band conv U-net
operating entirely in stacked DWT bands, plus the shared BBlock conv unit
(network/common.py BBlock)."""

import jax.numpy as jnp
import flax.linen as nn

from ..ops.dwt import dwt, iwt


class BBlock(nn.Module):
    """conv3×3 + ELU (network/common.py BBlock with default act)."""
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.elu(nn.Conv(self.features, (3, 3), padding=1)(x))


class BSR(nn.Module):
    """Wavelet multi-band net (mwnet.py BSR:36-116): three DWT levels with
    conv stacks between, IWT back up, sigmoid 1-ch output."""
    n_feats: int = 64
    n: int = 3

    @nn.compact
    def __call__(self, x):
        f = self.n_feats
        h = dwt(x)                                    # 3 → 12 ch
        h = BBlock(160, name="head")(h)
        for i in range(self.n):
            h = BBlock(160, name=f"d1_{i}")(h)
        x1 = h
        h = dwt(x1)                                   # 160 → 640
        h = BBlock(f * 4, name="d2_head")(h)
        for i in range(self.n):
            h = BBlock(f * 4, name=f"d2_{i}")(h)
        x2 = h
        h = dwt(x2)                                   # 256 → 1024
        h = BBlock(f * 4, name="p3_head")(h)
        for i in range(2 * self.n):
            h = BBlock(f * 4, name=f"p3_{i}")(h)
        h = BBlock(f * 16, name="p3_tail")(h)
        h = iwt(h)                                    # 1024 → 256
        for i in range(self.n):
            h = BBlock(f * 4, name=f"i2_{i}")(h)
        h = BBlock(640, name="i2_tail")(h)
        h = iwt(h)                                    # 640 → 160
        for i in range(self.n):
            h = BBlock(160, name=f"i1_{i}")(h)
        out = nn.Conv(1, (3, 3), padding=1, name="tail")(h)
        return nn.sigmoid(out)
