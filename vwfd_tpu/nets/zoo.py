"""Remaining architecture zoo from models/networks.py and friends:
Self_Attn, NormalGenerator, EdgeGenerator, InpaintGenerator, tianchi_Unet,
Discriminator_VGG_128 + VGGFeatureExtractor stand-in, CropLocalizeNet,
and the legacy IRN (InvRescaleNet with additive+affine InvBlockExp,
models/modules/Inv_arch.py)."""

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.haar import haar_downsample, haar_upsample
from .blocks import SNConv, ResnetBlock
from .inn import ResSubnet, DenseSubnet, _e


class SelfAttention(nn.Module):
    """SAGAN self-attention (networks.py:63-98): γ starts at 0."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        q = nn.Conv(c // 8, (1, 1), name="query")(x).reshape(b, h * w, c // 8)
        k = nn.Conv(c // 8, (1, 1), name="key")(x).reshape(b, h * w, c // 8)
        v = nn.Conv(c, (1, 1), name="value")(x).reshape(b, h * w, c)
        attn = jax.nn.softmax(
            jnp.einsum("bnd,bmd->bnm", q, k,
                       preferred_element_type=jnp.float32), axis=-1)
        out = jnp.einsum("bnm,bmc->bnc", attn, v,
                         preferred_element_type=jnp.float32).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * out + x


class NormalGenerator(nn.Module):
    """Haar U-net of plain ResBlocks, NOT invertible (networks.py:132-212):
    the IRN family's non-invertible counterpart; output truncated to
    `out_channels`."""
    channels: int = 3
    down_num: int = 3
    block_num: Sequence[int] = (4, 4, 4)
    out_channels: int = 3

    @nn.compact
    def __call__(self, x):
        ch = self.channels
        for i in range(self.down_num):
            x = haar_downsample(x)
            ch *= 4
            for j in range(self.block_num[i]):
                x = ResSubnet(ch, name=f"down{i}_res{j}")(x)
        sched = list(self.block_num[:-1])[::-1] + [0]
        for i in range(self.down_num):
            x = haar_upsample(x)
            ch //= 4
            for j in range(sched[i]):
                x = ResSubnet(ch, name=f"up{i}_res{j}")(x)
        return x[..., :self.out_channels]


class EdgeGenerator(nn.Module):
    """EdgeConnect-style generator (networks.py:1327-1379): 7×7 head,
    2× stride-2 downs, dilated residual middle, 2× transpose ups, 7×7 tail."""
    out_channels: int = 1
    residual_blocks: int = 8
    use_spectral_norm: bool = True

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        sn = self.use_spectral_norm
        h = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        h = nn.gelu(SNConv(64, (7, 7), padding="VALID", use_spectral_norm=sn,
                           name="enc0")(h, update_sn))
        h = nn.gelu(SNConv(128, (4, 4), strides=(2, 2), padding=1,
                           use_spectral_norm=sn, name="enc1")(h, update_sn))
        h = nn.gelu(SNConv(256, (4, 4), strides=(2, 2), padding=1,
                           use_spectral_norm=sn, name="enc2")(h, update_sn))
        for i in range(self.residual_blocks):
            h = ResnetBlock(256, dilation=2, use_spectral_norm=sn,
                            name=f"res{i}")(h, update_sn)
        h = nn.gelu(SNConv(128, (4, 4), strides=(2, 2), padding="SAME",
                           transpose=True, use_spectral_norm=sn,
                           name="dec0")(h, update_sn))
        h = nn.gelu(SNConv(64, (4, 4), strides=(2, 2), padding="SAME",
                           transpose=True, use_spectral_norm=sn,
                           name="dec1")(h, update_sn))
        h = jnp.pad(h, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        return nn.Conv(self.out_channels, (7, 7), padding="VALID",
                       name="tail")(h)


class InpaintGenerator(nn.Module):
    """EdgeConnect inpaint generator (networks.py:262-347): same shape as
    EdgeGenerator with instance-norm-free conv stacks and (tanh+1)/2 output."""
    out_channels: int = 3
    residual_blocks: int = 8

    @nn.compact
    def __call__(self, x):
        h = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        h = nn.gelu(nn.Conv(64, (7, 7), padding="VALID", name="enc0")(h))
        h = nn.gelu(nn.Conv(128, (4, 4), strides=(2, 2), padding=1,
                            name="enc1")(h))
        h = nn.gelu(nn.Conv(256, (4, 4), strides=(2, 2), padding=1,
                            name="enc2")(h))
        for i in range(self.residual_blocks):
            h = ResnetBlock(256, dilation=2, use_spectral_norm=False,
                            name=f"res{i}")(h)
        h = nn.gelu(nn.ConvTranspose(128, (4, 4), strides=(2, 2),
                                     name="dec0")(h))
        h = nn.gelu(nn.ConvTranspose(64, (4, 4), strides=(2, 2),
                                     name="dec1")(h))
        h = jnp.pad(h, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        h = nn.Conv(self.out_channels, (7, 7), padding="VALID", name="tail")(h)
        return (jnp.tanh(h) + 1.0) / 2.0


class DiscriminatorVGG128(nn.Module):
    """VGG-style 128² discriminator (models/modules/discriminator_vgg_arch.py:6-60):
    5 conv+BN stages halving resolution, 100-d linear, 1-d head."""
    base: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        nf = self.base

        def cbl(z, feats, k, s, name):
            z = nn.Conv(feats, (k, k), strides=(s, s),
                        padding=(k // 2, k // 2), use_bias=False, name=name)(z)
            z = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=name + "_bn")(z)
            return nn.leaky_relu(z, 0.2)

        h = nn.leaky_relu(nn.Conv(nf, (3, 3), padding=1, name="conv0_0")(x), 0.2)
        h = cbl(h, nf, 4, 2, "conv0_1")
        for i, feats in enumerate((nf * 2, nf * 4, nf * 8, nf * 8), start=1):
            h = cbl(h, feats, 3, 1, f"conv{i}_0")
            h = cbl(h, feats, 4, 2, f"conv{i}_1")
        h = h.reshape(h.shape[0], -1)
        h = nn.leaky_relu(nn.Dense(100, name="linear1")(h), 0.2)
        return nn.Dense(1, name="linear2")(h)


class CropLocalizeNet(nn.Module):
    """Patch-location regressor (models/crop_localize_net.py:7-36): conv
    embedder (ResNet18 stand-in trunk) + linear head over `out_dims`."""
    out_dims: int = 4
    base: int = 32

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = nn.Conv(self.base, (7, 7), strides=(2, 2), padding=3,
                    name="stem")(x)
        h = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, name="stem_bn")(h))
        for i, feats in enumerate((self.base, self.base * 2, self.base * 4,
                                   self.base * 8)):
            stride = 1 if i == 0 else 2
            ident = h
            z = nn.Conv(feats, (3, 3), strides=(stride, stride), padding=1,
                        use_bias=False, name=f"l{i}_c1")(h)
            z = nn.relu(nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, name=f"l{i}_bn1")(z))
            z = nn.Conv(feats, (3, 3), padding=1, use_bias=False,
                        name=f"l{i}_c2")(z)
            z = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"l{i}_bn2")(z)
            if ident.shape[-1] != feats or stride != 1:
                ident = nn.Conv(feats, (1, 1), strides=(stride, stride),
                                name=f"l{i}_proj")(ident)
            h = nn.relu(z + ident)
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.out_dims, name="head")(h)


# ----------------------------------------------------------- legacy IRN


class InvBlockExp(nn.Module):
    """Legacy IRN coupling (models/modules/Inv_arch.py:55-88): additive update
    on the first split, clamped-affine on the second."""
    channel_num: int
    channel_split: int
    subnet: str = "dense"
    clamp: float = 1.0

    def setup(self):
        sub = {"res": ResSubnet, "dense": DenseSubnet}[self.subnet]
        c1 = self.channel_split
        c2 = self.channel_num - c1
        self.F = sub(c1)
        self.G = sub(c2)
        self.H = sub(c2)
        self._c1 = c1

    def __call__(self, x, rev: bool = False):
        x1, x2 = x[..., :self._c1], x[..., self._c1:]
        if not rev:
            y1 = x1 + self.F(x2)
            s = self.clamp * (nn.sigmoid(self.H(y1)) * 2 - 1)
            y2 = x2 * jnp.exp(s) + self.G(y1)
        else:
            s = self.clamp * (nn.sigmoid(self.H(x1)) * 2 - 1)
            y2 = (x2 - self.G(x1)) * jnp.exp(-s)
            y1 = x1 - self.F(y2)
        return jnp.concatenate([y1, y2], -1)


class InvRescaleNet(nn.Module):
    """Legacy invertible rescaling net (Inv_arch.py:240-313): per scale, one
    Haar down + `block_num` InvBlockExp couplings splitting at channel_in."""
    channel_in: int = 3
    down_num: int = 2
    block_num: Sequence[int] = (6, 6)
    subnet: str = "dense"

    def setup(self):
        ops = []
        ch = self.channel_in
        for i in range(self.down_num):
            ch *= 4
            ops.append([InvBlockExp(ch, self.channel_in, self.subnet)
                        for _ in range(self.block_num[i])])
        self.blocks = ops

    def __call__(self, x, rev: bool = False):
        if not rev:
            for group in self.blocks:
                x = haar_downsample(x)
                for b in group:
                    x = b(x)
            return x
        for group in reversed(self.blocks):
            for b in reversed(group):
                x = b(x, rev=True)
            x = haar_upsample(x)
        return x


class MantraNet(nn.Module):
    """Image-manipulation trace extractor → QF regressor
    (models/conditional_jpeg_generator.py:539-694): init/Bayar/SRM 5×5 front
    (4+3+9=16ch), 12-layer VALID-padded GELU conv trunk to 256ch, GAP + MLP
    head to a scalar QF. Convs use symmetric padding per layer like the
    reference's symm_pad-wrapped trunk."""
    out_dims: int = 1

    @nn.compact
    def __call__(self, x):
        from ..ops.filters import srm_conv, bayar_constrain
        from ..ops.pad import symm_pad

        xp = symm_pad(x, (2, 2, 2, 2))
        conv_init = nn.Conv(4, (5, 5), padding="VALID", use_bias=False,
                            name="init_conv")(xp)
        bayar_kernel = self.param("bayar_kernel",
                                  nn.initializers.kaiming_normal(),
                                  (5, 5, x.shape[-1], 3))
        bk = bayar_constrain(bayar_kernel)
        conv_bayar = jax.lax.conv_general_dilated(
            xp, bk, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        conv_srm = srm_conv(xp)
        h = nn.gelu(jnp.concatenate([conv_init, conv_srm, conv_bayar], -1))
        widths = (32, 64, 64, 128, 128, 128, 256, 256, 256, 256, 256, 256)
        for i, wdt in enumerate(widths):
            h = symm_pad(h, (1, 1, 1, 1))
            h = nn.Conv(wdt, (3, 3), padding="VALID", name=f"trunk{i}")(h)
            if i < len(widths) - 1:
                h = nn.gelu(h)
        h = jnp.mean(h, axis=(1, 2))
        h = nn.gelu(nn.Dense(256, name="fc0")(h))
        h = nn.gelu(nn.Dense(256, name="fc1")(h))
        return nn.Dense(self.out_dims, name="fc2")(h)


class AttackNet(nn.Module):
    """Learned attack network (models/modules/Inv_arch.py:176-238) — Haar
    encoder with dense blocks, mirrored decoder back to input resolution.
    (The committed forward composes the 'inverse' list with forward-mode Haar,
    which shrinks the output — a dead/debug path; this is the intended
    encoder-decoder form, same parameter budget.)"""
    channels: int = 3
    down_num: int = 2

    @nn.compact
    def __call__(self, x):
        ch = self.channels
        for i in range(self.down_num):
            x = haar_downsample(x)
            ch *= 4
            for j in range(4):
                x = DenseSubnet(ch, name=f"down{i}_d{j}")(x)
        for i in range(self.down_num):
            for j in range(4):
                x = DenseSubnet(ch, name=f"up{i}_d{j}")(x)
            x = haar_upsample(x)
            ch //= 4
        return x
