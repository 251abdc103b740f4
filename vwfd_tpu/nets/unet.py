"""Textbook U-Net — the video tamper-mask predictor (`generator` in the
flagship IRNcrop model). Reference: network/UNet.py:7-98.

Encoder ×4 (double conv+BN+ReLU, maxpool), bottleneck, decoder ×4 with
transposed-conv upsampling and skip concatenation, 1×1 conv + sigmoid head.
"""

import jax.numpy as jnp
import flax.linen as nn


class _DoubleConv(nn.Module):
    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                        kernel_init=nn.initializers.kaiming_normal(),
                        dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    out_channels: int = 1
    init_features: int = 32
    apply_sigmoid: bool = True
    dtype: object = None  # compute dtype; params/output stay f32

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = self.init_features
        dt = self.dtype
        enc1 = _DoubleConv(f, dtype=dt, name="enc1")(x, train)
        enc2 = _DoubleConv(f * 2, dtype=dt, name="enc2")(
            nn.max_pool(enc1, (2, 2), (2, 2)), train)
        enc3 = _DoubleConv(f * 4, dtype=dt, name="enc3")(
            nn.max_pool(enc2, (2, 2), (2, 2)), train)
        enc4 = _DoubleConv(f * 8, dtype=dt, name="enc4")(
            nn.max_pool(enc3, (2, 2), (2, 2)), train)
        bott = _DoubleConv(f * 16, dtype=dt, name="bottleneck")(
            nn.max_pool(enc4, (2, 2), (2, 2)), train)

        def up(z, feats, name):
            return nn.ConvTranspose(feats, (2, 2), strides=(2, 2),
                                    dtype=dt, name=name)(z)

        d4 = _DoubleConv(f * 8, dtype=dt, name="dec4")(
            jnp.concatenate([up(bott, f * 8, "up4"), enc4], -1), train)
        d3 = _DoubleConv(f * 4, dtype=dt, name="dec3")(
            jnp.concatenate([up(d4, f * 4, "up3"), enc3], -1), train)
        d2 = _DoubleConv(f * 2, dtype=dt, name="dec2")(
            jnp.concatenate([up(d3, f * 2, "up2"), enc2], -1), train)
        d1 = _DoubleConv(f, dtype=dt, name="dec1")(
            jnp.concatenate([up(d2, f, "up1"), enc1], -1), train)
        out = nn.Conv(self.out_channels, (1, 1), name="head")(
            d1.astype(jnp.float32))
        return nn.sigmoid(out) if self.apply_sigmoid else out
