"""MBRS watermarking family (vendored at mbrs_models/ in the reference).

SE-block encoder (`Encoder_MP`/`Encoder_MP_Diffusion`, Encoder_MP.py:4-115),
message-diffusion decoder (`Decoder`/`Decoder_Diffusion`/`Decoder_MLP`,
Decoder.py:32-118), SENet blocks (blocks/SENet.py:5-132), ExpandNet
(blocks/ExpandNet.py) and the Baluja prep/hide/reveal trio
(baluja_networks.py:5-160).
"""

import math
from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from .blocks import ConvBNRelu


class SEBottleneck(nn.Module):
    """BottleneckBlock with squeeze-excitation (blocks/SENet.py:52-91)."""
    features: int
    r: int = 8
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        ident = x
        h = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (1, 1), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        # squeeze-excitation
        s = jnp.mean(h, axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Conv(self.features // self.r, (1, 1), use_bias=False)(s))
        s = nn.sigmoid(nn.Conv(self.features, (1, 1), use_bias=False)(s))
        h = h * s
        if ident.shape[-1] != self.features or self.stride != 1:
            ident = nn.Conv(self.features, (1, 1),
                            strides=(self.stride, self.stride),
                            use_bias=False, name="downsample")(ident)
            ident = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, name="downsample_bn")(ident)
        return nn.relu(h + ident)


class SENet(nn.Module):
    """Stack of SE bottlenecks (blocks/SENet.py:94-110)."""
    features: int
    blocks: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i in range(self.blocks):
            x = SEBottleneck(self.features, name=f"block{i}")(x, train)
        return x


class SENetDecoder(nn.Module):
    """Strided SE stack doubling channels per stage (blocks/SENet.py:113-132)."""
    features: int
    blocks: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = self.features
        x = SEBottleneck(f, name="block0")(x, train)
        for i in range(self.blocks - 1):
            x = SEBottleneck(f, name=f"keep{i}")(x, train)
            f *= 2
            x = SEBottleneck(f, stride=2, name=f"down{i}")(x, train)
        return x


class ExpandNet(nn.Module):
    """Transposed-conv ×2 upsampling stack (blocks/ExpandNet.py)."""
    features: int
    blocks: int = 3

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i in range(self.blocks):
            x = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                                 name=f"up{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class MBRSEncoder(nn.Module):
    """Encoder_MP_Diffusion (Encoder_MP.py:64-115): image SE trunk + message
    diffusion branch (linear → square map → ExpandNet → SE) concatenated."""
    height: int = 128
    message_length: int = 30
    channels: int = 64
    blocks: int = 4
    diffusion_length: int = 256

    @nn.compact
    def __call__(self, image, message, train: bool = True):
        c = self.channels
        img = ConvBNRelu(c, name="image_pre")(image, train)
        img = SENet(c, self.blocks, name="image_first")(img, train)

        dsize = int(self.diffusion_length ** 0.5)
        m = nn.Dense(self.diffusion_length, name="message_duplicate")(message)
        m = m.reshape(-1, dsize, dsize, 1)
        m = ConvBNRelu(c, name="message_pre0")(m, train)
        n_up = int(math.log2(self.height // dsize))
        m = ExpandNet(c, blocks=n_up, name="message_expand")(m, train)
        m = SENet(c, 1, name="message_pre2")(m, train)
        m = SENet(c, self.blocks, name="message_first")(m, train)

        h = ConvBNRelu(c, name="after_concat")(jnp.concatenate([img, m], -1), train)
        return nn.Conv(3, (1, 1), name="final")(jnp.concatenate([h, image], -1))


class MBRSDecoder(nn.Module):
    """Decoder_Diffusion (Decoder.py:88-118): strided SE trunk down to the
    diffusion map, then linear back to the message."""
    height: int = 128
    message_length: int = 30
    channels: int = 64
    diffusion_length: int = 256

    @nn.compact
    def __call__(self, image, train: bool = True):
        c = self.channels
        dsize = int(self.diffusion_length ** 0.5)
        stride_blocks = int(math.log2(self.height // dsize))
        h = ConvBNRelu(c, name="pre")(image, train)
        h = SENetDecoder(c, blocks=stride_blocks + 1, name="down")(h, train)
        h = ConvBNRelu(c, name="mid")(h, train)
        h = SENet(c, 1, name="keep")(h, train)
        h = ConvBNRelu(1, name="final")(h, train)
        h = h.reshape(h.shape[0], -1)
        return nn.Dense(self.message_length, name="message")(h)


class MBRSPlainDecoder(nn.Module):
    """The plain conv `Decoder(out_num)` variant (Decoder.py:56-85):
    9 ConvBNRelu + GAP + linear, (tanh+1)/2 output."""
    out_num: int = 4
    channels: int = 64

    @nn.compact
    def __call__(self, image, train: bool = True):
        h = ConvBNRelu(self.channels, name="conv0")(image, train)
        for i in range(8):
            h = ConvBNRelu(self.channels, name=f"conv{i+1}")(h, train)
        h = ConvBNRelu(self.out_num, name="head")(h, train)
        h = jnp.mean(h, axis=(1, 2))
        return (jnp.tanh(nn.Dense(self.out_num, name="linear")(h)) + 1.0) / 2.0


class BalujaPrep(nn.Module):
    """PrepNetwork (baluja_networks.py:5-58): 3 parallel branches with
    3/4/5 kernels, two stages, concatenated."""
    features: int = 50

    @nn.compact
    def __call__(self, x):
        outs = []
        for k in (3, 4, 5):
            h = nn.relu(nn.Conv(self.features, (k, k), padding="SAME",
                                name=f"s1_k{k}")(x))
            outs.append(h)
        h = jnp.concatenate(outs, -1)
        outs2 = []
        for k in (3, 4, 5):
            outs2.append(nn.relu(nn.Conv(self.features, (k, k), padding="SAME",
                                         name=f"s2_k{k}")(h)))
        return jnp.concatenate(outs2, -1)


class BalujaHiding(nn.Module):
    """HidingNetwork (baluja_networks.py:60-117): 5 stages of parallel
    3/4/5-kernel branches, final 3→image conv."""
    features: int = 50

    @nn.compact
    def __call__(self, x):
        h = x
        for s in range(5):
            outs = [nn.relu(nn.Conv(self.features, (k, k), padding="SAME",
                                    name=f"s{s}_k{k}")(h)) for k in (3, 4, 5)]
            h = jnp.concatenate(outs, -1)
        return nn.Conv(3, (1, 1), name="final")(h)


class BalujaReveal(nn.Module):
    """RevealNetwork (baluja_networks.py:119-176): same trunk, reveals the
    hidden image from the container."""
    features: int = 50

    @nn.compact
    def __call__(self, x):
        h = x
        for s in range(5):
            outs = [nn.relu(nn.Conv(self.features, (k, k), padding="SAME",
                                    name=f"s{s}_k{k}")(h)) for k in (3, 4, 5)]
            h = jnp.concatenate(outs, -1)
        return nn.Conv(3, (1, 1), name="final")(h)
