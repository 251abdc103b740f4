"""HiDDeN watermarking family (vendored at hidden_models/ in the reference,
with broken imports there — rebuilt here as working Flax modules).

Encoder spatially replicates the message and concatenates it with conv
features + the image (hidden_models/encoder.py:8-43); decoder convs → global
average pool → linear message head (decoder.py:8-36); plain conv
discriminator (discriminator.py:6-27).
"""

from typing import Callable, Optional

import jax.numpy as jnp
import flax.linen as nn

from .blocks import ConvBNRelu


class HiddenEncoder(nn.Module):
    message_length: int = 30
    channels: int = 64
    blocks: int = 4

    @nn.compact
    def __call__(self, image, message, train: bool = True):
        h = image
        for i in range(self.blocks):
            h = ConvBNRelu(self.channels, name=f"conv{i}")(h, train)
        b, ih, iw, _ = image.shape
        expanded = jnp.broadcast_to(message[:, None, None, :],
                                    (b, ih, iw, message.shape[-1]))
        concat = jnp.concatenate([expanded, h, image], axis=-1)
        h = ConvBNRelu(self.channels, name="after_concat")(concat, train)
        return nn.Conv(3, (1, 1), name="final")(h)


class HiddenDecoder(nn.Module):
    message_length: int = 30
    channels: int = 64
    blocks: int = 7

    @nn.compact
    def __call__(self, image_wm, train: bool = True):
        h = image_wm
        for i in range(self.blocks):
            h = ConvBNRelu(self.channels, name=f"conv{i}")(h, train)
        h = ConvBNRelu(self.message_length, name="msg_conv")(h, train)
        h = jnp.mean(h, axis=(1, 2))  # AdaptiveAvgPool2d(1)
        return nn.Dense(self.message_length, name="linear")(h)


class HiddenDiscriminator(nn.Module):
    channels: int = 64
    blocks: int = 3

    @nn.compact
    def __call__(self, image, train: bool = True):
        h = image
        for i in range(self.blocks):
            h = ConvBNRelu(self.channels, name=f"conv{i}")(h, train)
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(1, name="linear")(h)


class HiddenEncoderDecoder(nn.Module):
    """encode → noise → decode pipeline (hidden_models/encoder_decoder.py:8-29).
    `noiser(key, encoded, cover) -> noised` is any attack callable."""
    message_length: int = 30
    encoder_channels: int = 64
    encoder_blocks: int = 4
    decoder_channels: int = 64
    decoder_blocks: int = 7

    def setup(self):
        self.encoder = HiddenEncoder(self.message_length, self.encoder_channels,
                                     self.encoder_blocks)
        self.decoder = HiddenDecoder(self.message_length, self.decoder_channels,
                                     self.decoder_blocks)

    def __call__(self, image, message, noiser: Optional[Callable] = None,
                 noise_key=None, train: bool = True):
        encoded = self.encoder(image, message, train)
        noised = encoded if noiser is None else noiser(noise_key, encoded, image)
        decoded = self.decoder(noised, train)
        return encoded, noised, decoded
