"""Patch discriminators — models/networks.py `Discriminator` (:631-749) and
`DG_discriminator` (:559-628)."""

import jax.numpy as jnp
import flax.linen as nn

from .blocks import SNConv


class Discriminator(nn.Module):
    """6-stage spectral-norm patch discriminator (networks.py:631-749):
    init(4s2+3s1) → 4× (4s2+3s1 doubling dim) → 1×1 head; optional sigmoid."""
    dim: int = 32
    use_sigmoid: bool = True
    use_spectral_norm: bool = True

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        def pair(z, feats, name):
            z = SNConv(feats, (4, 4), strides=(2, 2), padding=1,
                       use_bias=not self.use_spectral_norm,
                       use_spectral_norm=self.use_spectral_norm,
                       name=f"{name}_a")(z, update_sn)
            z = nn.gelu(z)
            z = SNConv(feats, (3, 3), padding=1,
                       use_bias=not self.use_spectral_norm,
                       use_spectral_norm=self.use_spectral_norm,
                       name=f"{name}_b")(z, update_sn)
            return nn.gelu(z)

        d = self.dim
        h = pair(x, d, "init")
        h = pair(h, d * 2, "conv1")
        h = pair(h, d * 4, "conv2")
        h = pair(h, d * 8, "conv3")
        h = pair(h, d * 16, "conv4")
        out = nn.Conv(1, (1, 1), use_bias=False, name="conv5")(h)
        return nn.sigmoid(out) if self.use_sigmoid else out


class DGDiscriminator(nn.Module):
    """256-dim spectral-norm patch-D returning per-stage features
    (networks.py:559-628). Used by IRNcrop as `discriminator` on feature maps."""
    dim: int = 256
    use_sigmoid: bool = True
    use_spectral_norm: bool = True

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        feats = []
        h = x
        specs = [((4, 4), (2, 2)), ((4, 4), (2, 2)), ((4, 4), (2, 2)),
                 ((4, 4), (1, 1))]
        for i, (k, s) in enumerate(specs):
            h = SNConv(self.dim, k, strides=s, padding=1,
                       use_bias=not self.use_spectral_norm,
                       use_spectral_norm=self.use_spectral_norm,
                       name=f"conv{i+1}")(h, update_sn)
            h = nn.gelu(h)
            feats.append(h)
        out = nn.Conv(1, (1, 1), use_bias=False, name="conv5")(h)
        feats.append(out)
        if self.use_sigmoid:
            out = nn.sigmoid(out)
        return out, feats
