"""Textbook U-Net — the video tamper-mask predictor (`generator` in the
flagship IRNcrop model). Reference: network/UNet.py:7-98.

Encoder ×4 (double conv+BN+ReLU, maxpool), bottleneck, decoder ×4 with
transposed-conv upsampling and skip concatenation, 1×1 conv + sigmoid head.
"""

import jax.numpy as jnp
import flax.linen as nn


class _DoubleConv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                        kernel_init=nn.initializers.kaiming_normal())(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    out_channels: int = 1
    init_features: int = 32
    apply_sigmoid: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = self.init_features
        enc1 = _DoubleConv(f, name="enc1")(x, train)
        enc2 = _DoubleConv(f * 2, name="enc2")(nn.max_pool(enc1, (2, 2), (2, 2)), train)
        enc3 = _DoubleConv(f * 4, name="enc3")(nn.max_pool(enc2, (2, 2), (2, 2)), train)
        enc4 = _DoubleConv(f * 8, name="enc4")(nn.max_pool(enc3, (2, 2), (2, 2)), train)
        bott = _DoubleConv(f * 16, name="bottleneck")(
            nn.max_pool(enc4, (2, 2), (2, 2)), train)

        def up(z, feats, name):
            return nn.ConvTranspose(feats, (2, 2), strides=(2, 2),
                                    name=name)(z)

        d4 = _DoubleConv(f * 8, name="dec4")(
            jnp.concatenate([up(bott, f * 8, "up4"), enc4], -1), train)
        d3 = _DoubleConv(f * 4, name="dec3")(
            jnp.concatenate([up(d4, f * 4, "up3"), enc3], -1), train)
        d2 = _DoubleConv(f * 2, name="dec2")(
            jnp.concatenate([up(d3, f * 2, "up2"), enc2], -1), train)
        d1 = _DoubleConv(f, name="dec1")(
            jnp.concatenate([up(d2, f, "up1"), enc1], -1), train)
        out = nn.Conv(self.out_channels, (1, 1), name="head")(d1)
        return nn.sigmoid(out) if self.apply_sigmoid else out
