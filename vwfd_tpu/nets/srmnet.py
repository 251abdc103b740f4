"""SRMNet — selective-kernel residual-dense U-Net, the alternative tianchi
segmentation net (network/SRMNet.py:163-246: multi-scale input bars,
pixel-(un)shuffle resizing, SKFF fusion head, sigmoid output)."""

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..ops.resize import resize_bilinear


def _ps_down(x, out, name_conv):
    """PixelUnshuffle(2) + 1×1 conv (SRMNet.py PS_down:49-58)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    return name_conv(x)


def _ps_up(x, name_conv):
    """PixelShuffle(2) + 1×1 conv (SRMNet.py PS_up:60-70)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, 2, 2, c // 4)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c // 4)
    return name_conv(x)


class SKFF(nn.Module):
    """Selective-kernel feature fusion over `height` branches
    (SRMNet.py:74-106)."""
    features: int
    height: int = 3
    reduction: int = 8

    @nn.compact
    def __call__(self, feats):
        u = sum(feats)
        s = jnp.mean(u, axis=(1, 2), keepdims=True)
        d = max(self.features // self.reduction, 4)
        z = nn.Conv(d, (1, 1), use_bias=False, name="du")(s)
        z = nn.PReLU()(z)
        att = [nn.Conv(self.features, (1, 1), use_bias=False,
                       name=f"fc{i}")(z) for i in range(self.height)]
        att = jnp.stack(att, axis=1)  # (B, height, 1, 1, C)
        att = jax_softmax_axis1(att)
        out = sum(att[:, i] * feats[i] for i in range(self.height))
        return out


def jax_softmax_axis1(x):
    import jax
    return jax.nn.softmax(x, axis=1)


class SKRDB(nn.Module):
    """SK residual dense block (SRMNet.py:123-137): num_layers DenseLayers
    (conv+relu fused with input via 2-way SKFF) + 1×1 local fusion + identity."""
    growth: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        res = nn.Conv(self.growth, (1, 1), name="identity")(x)
        h = x
        for i in range(self.num_layers):
            h1 = nn.relu(nn.Conv(c, (3, 3), padding=1, name=f"dense{i}")(h))
            h = SKFF(c, height=2, name=f"sk{i}")([h, h1])
        h = nn.Conv(self.growth, (1, 1), name="lff")(h)
        return res + h


class SRMNet(nn.Module):
    out_channels: int = 3
    wf: int = 96
    depth: int = 4

    @nn.compact
    def __call__(self, x):
        wf, depth = self.wf, self.depth
        conv01 = nn.Conv(wf, (3, 3), padding=1, name="conv_01")
        h = conv01(x)
        scale_img = x
        encs = []
        for i in range(depth):
            if i > 0:
                scale_img = resize_bilinear(
                    scale_img, (scale_img.shape[1] // 2, scale_img.shape[2] // 2))
                h = jnp.concatenate([h, conv01(scale_img)], -1)
            feats = (2 ** i) * wf
            h = SKRDB(feats, name=f"down{i}")(h)
            if i + 1 < depth:
                encs.append(h)
                down_conv = nn.Conv(feats, (1, 1), name=f"psdown{i}")
                h = _ps_down(h, feats, down_conv)

        full = x.shape[1]
        ms = [resize_bilinear(
            nn.Conv(wf, (3, 3), padding=1, name="bottom_conv")(h),
            (full, full))]
        prev = (2 ** (depth - 1)) * wf
        for idx, i in enumerate(reversed(range(depth - 1))):
            feats = (2 ** i) * wf
            up_conv = nn.Conv(feats, (1, 1), name=f"psup{idx}")
            up = _ps_up(h, up_conv)
            skip = nn.Conv(feats, (3, 3), padding=1,
                           name=f"skip{idx}")(encs[-idx - 1])
            h = jnp.concatenate([up, skip], -1)
            h = SKRDB(feats, name=f"up{idx}")(h)
            ms.append(resize_bilinear(
                nn.Conv(wf, (3, 3), padding=1, name=f"convup{idx}")(h),
                (full, full)))
        fused = SKFF(wf, height=depth, name="final_ff")(ms)
        out = nn.Conv(self.out_channels, (3, 3), padding=1, name="last")(fused)
        return nn.sigmoid(out)
