"""Invertible watermark-embedding network (the core model family).

Re-design of models/invertible_net.py for TPU:
  * Haar lifting is reshape+add (ops/haar.py), not grouped convs.
  * Coupling blocks are explicit forward/inverse pure functions — the inverse
    *reconstructs* activations instead of storing them, so reverse-mode AD
    through `reverse()` needs no activation memory for the chain itself.
  * One module serves Inveritible_Decolorization (dense subnets, returns out)
    and Inveritible_Decolorization_PAMI / _light_weight (res subnets, reverse
    returns (out, middle)) via config, mirroring invertible_net.py:369-531.

Layout: NHWC. `dims_in=[[12,50,50]]` in the reference becomes `channels=12`.
"""

from typing import Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..ops.haar import (haar_downsample, haar_downsample_conv, haar_upsample,
                        haar_upsample_conv)
from .blocks import scaled_glorot

_CLAMP = 1.0
_AFFINE_EPS = 1e-4


class DenseSubnet(nn.Module):
    """5-conv dense block, ELU, zero-init final (invertible_net.py:301-324)."""
    out_channels: int
    gc: int = 32
    dtype: object = None  # compute dtype (bf16 for TPU speed; params stay f32)

    @nn.compact
    def __call__(self, x):
        init = scaled_glorot(0.1)
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)  # else concat(x_f32, h_bf16) re-promotes to f32
        x1 = nn.elu(nn.Conv(self.gc, (3, 3), padding=1, kernel_init=init,
                            dtype=dt)(x))
        x2 = nn.elu(nn.Conv(self.gc, (3, 3), padding=1, kernel_init=init,
                            dtype=dt)(jnp.concatenate([x, x1], -1)))
        x3 = nn.elu(nn.Conv(self.gc, (3, 3), padding=1, kernel_init=init,
                            dtype=dt)(jnp.concatenate([x, x1, x2], -1)))
        x4 = nn.elu(nn.Conv(self.gc, (3, 3), padding=1, kernel_init=init,
                            dtype=dt)(jnp.concatenate([x, x1, x2, x3], -1)))
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       kernel_init=nn.initializers.zeros, dtype=dt)(
            jnp.concatenate([x, x1, x2, x3, x4], -1))


class ResSubnet(nn.Module):
    """4×(conv64+ELU) then cat-skip + zero-init final conv
    (invertible_net.py:326-366)."""
    out_channels: int
    feature: int = 64
    dtype: object = None  # compute dtype (bf16 for TPU speed; params stay f32)

    @nn.compact
    def __call__(self, x):
        init = scaled_glorot(0.1)
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)  # else concat(x_f32, h_bf16) re-promotes to f32
        h = nn.elu(nn.Conv(self.feature, (3, 3), padding=1, kernel_init=init,
                           dtype=dt)(x))
        h = nn.elu(nn.Conv(self.feature, (3, 3), padding=1, kernel_init=init,
                           dtype=dt)(h))
        h = nn.elu(nn.Conv(self.feature, (3, 3), padding=1, kernel_init=init,
                           dtype=dt)(h))
        h = nn.elu(nn.Conv(self.feature, (3, 3), padding=1, kernel_init=init,
                           dtype=dt)(h))
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       kernel_init=nn.initializers.zeros, dtype=dt)(
            jnp.concatenate([x, h], -1))


class ResSubnetTPU(nn.Module):
    """MXU-shaped coupling trunk — the TPU-first alternative to `ResSubnet`.

    The reference trunk (4×64-wide 3×3 convs + a 3×3 cat-skip head,
    invertible_net.py:326-366) caps at 50% MXU utilization: every GEMM dim
    below the MXU's 128 lanes wastes the rest (r3 profile, BASELINE.md).
    This trunk keeps the same role and interface (cat-skip, zero-init final
    so couplings start at identity) with MXU-aligned shapes:

      * two 3×3 convs at width 128 (full output lanes; receptive field 5×5),
      * a 1×1 cat-skip head — the head's output width is fixed by the
        coupling split (48 at the 48-ch level), so shrinking its contraction
        9× is where the reference trunk loses most of its cycles.

    ~0.76× the reference trunk's FLOPs at ~2× the utilization. Embedding
    quality/localization parity is shown by the convergence run
    (BASELINE.md r3). Selected by `ModelConfig.inn_subnet = "res_tpu"`.
    """
    out_channels: int
    feature: int = 128
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        init = scaled_glorot(0.1)
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
        h = nn.elu(nn.Conv(self.feature, (3, 3), padding=1, kernel_init=init,
                           dtype=dt)(x))
        h = nn.elu(nn.Conv(self.feature, (3, 3), padding=1, kernel_init=init,
                           dtype=dt)(h))
        return nn.Conv(self.out_channels, (1, 1),
                       kernel_init=nn.initializers.zeros, dtype=dt)(
            jnp.concatenate([x, h], -1))


class ResSubnetTPUS2(nn.Module):
    """`ResSubnetTPU` with the trunk computed at HALF spatial resolution.

    The r3 cost analysis (BASELINE.md) shows the embed INN is *bandwidth*-
    bound (17.2 GB/step vs a 21 ms HBM roof at b32/256²), and that the bytes
    concentrate in the high-res couplings' 128-channel trunk intermediates
    (128²×128 bf16 = 4 MB/frame per conv output). This trunk space-to-depths
    its input 2× (H,W,C → H/2,W/2,4C), runs the same two 128-wide 3×3 convs
    there (4× smaller intermediates, ~2.4× fewer trunk FLOPs, ~6×6 effective
    receptive field), and emits a depth-to-space-packed head (1×1 to
    4·out_channels, zero-init so couplings still start at identity).

    Same role/interface as `ResSubnet` (invertible_net.py:326-366). Selected
    by `ModelConfig.inn_subnet = "res_tpu2"`; couplings with ≥256 channels
    fall back to `res_tpu` (their spatial dims are already small, and the
    s2d head would 4× the 1×1's contraction — a net loss at 768 channels).
    Quality parity vs `res_tpu` is convergence-validated (BASELINE.md r3).
    """
    out_channels: int
    feature: int = 128
    dtype: object = None
    # Express the space↔depth squeezes as fixed permutation convs
    # (ops/squeeze.py) instead of reshape+transpose: bit-identical outputs
    # and params, but no XLA layout round-trips between the squeezes and the
    # trunk convs (the r3 embed profile's dominant cost). False keeps the
    # reshape spelling (useful to A/B the layout effect in isolation).
    conv_squeeze: bool = True

    @nn.compact
    def __call__(self, x):
        from ..ops.squeeze import depth_to_space_conv, space_to_depth_conv
        init = scaled_glorot(0.1)
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
        b, hh, ww, c = x.shape
        if self.conv_squeeze:
            z = space_to_depth_conv(x)
        else:
            z = x.reshape(b, hh // 2, 2, ww // 2, 2, c)
            z = z.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, hh // 2, ww // 2, 4 * c)
        h = nn.elu(nn.Conv(self.feature, (3, 3), padding=1, kernel_init=init,
                           dtype=dt)(z))
        h = nn.elu(nn.Conv(self.feature, (3, 3), padding=1, kernel_init=init,
                           dtype=dt)(h))
        out = nn.Conv(4 * self.out_channels, (1, 1),
                      kernel_init=nn.initializers.zeros, dtype=dt)(
            jnp.concatenate([z, h], -1))
        if self.conv_squeeze:
            return depth_to_space_conv(out)
        out = out.reshape(b, hh // 2, ww // 2, 2, 2, self.out_channels)
        return out.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, hh, ww, self.out_channels)


_SUBNETS = {"res": ResSubnet, "dense": DenseSubnet, "res_tpu": ResSubnetTPU,
            "res_tpu2": ResSubnetTPUS2}


def _e(s):
    """Clamped multiplicative factor e(s)=exp(clamp·(2σ(s)−1))+ε
    (invertible_net.py:150-151)."""
    return jnp.exp(_CLAMP * (2.0 * nn.sigmoid(s) - 1.0)) + _AFFINE_EPS


class RNVPCoupling(nn.Module):
    """RealNVP affine coupling block (invertible_net.py:122-175).

    `fused_st=True` (TPU default) computes each (s, t) pair from ONE subnet
    trunk with a double-width zero-init head instead of the reference's two
    separate subnets — identical expressivity and invertibility, half the
    conv FLOPs, and wider (more MXU-efficient) final matmuls. Set False for
    the reference's exact parameterization.

    `width` overrides the subnet hidden width (reference ResBlock uses 64,
    invertible_net.py:329; 128 fills the MXU lane dim — a perf/parity knob)."""
    channels: int
    subnet: str = "res"
    dtype: object = None
    fused_st: bool = True
    width: int = 0  # 0 = subnet default

    def setup(self):
        split1 = self.channels // 2
        split2 = self.channels - split1
        subnet = self.subnet
        if subnet == "res_tpu2" and self.channels >= 256:
            # deep couplings keep the full-res trunk: spatial dims are already
            # small and the s2d-packed 1×1 head would 4× its contraction cost
            # at 768 channels (see ResSubnetTPUS2 docstring)
            subnet = "res_tpu"
        sub = _SUBNETS[subnet]
        kw = {}
        if self.width:
            kw = ({"feature": self.width} if self.subnet.startswith("res")
                  else {"gc": self.width})
        if self.fused_st:
            self.st1 = sub(2 * split2, dtype=self.dtype, **kw)
            self.st2 = sub(2 * split1, dtype=self.dtype, **kw)
        else:
            self.s1 = sub(split2, dtype=self.dtype, **kw)
            self.t1 = sub(split2, dtype=self.dtype, **kw)
            self.s2 = sub(split1, dtype=self.dtype, **kw)
            self.t2 = sub(split1, dtype=self.dtype, **kw)
        self._split1 = split1

    def _st1(self, z):
        if self.fused_st:
            h = self.st1(z)
            return h[..., :h.shape[-1] // 2], h[..., h.shape[-1] // 2:]
        return self.s1(z), self.t1(z)

    def _st2(self, z):
        if self.fused_st:
            h = self.st2(z)
            return h[..., :h.shape[-1] // 2], h[..., h.shape[-1] // 2:]
        return self.s2(z), self.t2(z)

    def forward(self, x):
        x1, x2 = x[..., :self._split1], x[..., self._split1:]
        s2, t2 = self._st2(x2)
        y1 = _e(s2) * x1 + t2
        s1, t1 = self._st1(y1)
        y2 = _e(s1) * x2 + t1
        return jnp.concatenate([y1, y2], -1)

    def inverse(self, y):
        y1, y2 = y[..., :self._split1], y[..., self._split1:]
        s1, t1 = self._st1(y1)
        x2 = (y2 - t1) / _e(s1)
        s2, t2 = self._st2(x2)
        x1 = (y1 - t2) / _e(s2)
        return jnp.concatenate([x1, x2], -1)

    def __call__(self, x, rev: bool = False):
        return self.inverse(x) if rev else self.forward(x)


class InvertibleNet(nn.Module):
    """U-shaped invertible chain: (Haar↓ + couplings)×N then (Haar↑ +
    couplings)×N — covers all three reference composites:

      * `Inveritible_Decolorization`       → style="flat",  subnet="dense"
      * `Inveritible_Decolorization_PAMI`  → style="updown", subnet="res"
        (flagship config: channels=12, block_num=(1,1,1) —
        models/IRNcrop_model.py:132-134)
      * `..._light_weight`                 → style="updown", subnet="res"

    After the down phase, `block_num` for the up phase is the reference's
    reversed-truncated schedule `block_num[:-1][::-1] + [0]`
    (invertible_net.py:386-387, 493-494).
    """
    channels: int = 12
    down_num: int = 3
    block_num: Sequence[int] = (1, 1, 1)
    subnet: str = "res"
    return_middle: bool = True  # PAMI-style reverse returns (out, mid)
    dtype: object = None        # compute dtype; None = float32
    fused_st: bool = True       # shared (s,t) trunks (see RNVPCoupling)
    width: int = 0              # subnet hidden width override (0 = default 64)
    # "lift" = reshape+add Haar (reference-equivalent math, minimal FLOPs);
    # "conv" = identical linear map as fixed-weight stride-2 convs — avoids
    # the XLA layout copies that dominate the embed profile (ops/haar.py);
    # "mixed" = conv where the band count is small (C ≤ 64: big copies,
    # trivial MACs — the shallow high-res levels) and lift at the deep
    # wide-channel levels where the conv bank's MACs outweigh the copies.
    haar: str = "lift"
    # Skip the final astype(float32): callers that transpose/pack the output
    # can do so at half the copy bytes and cast afterwards (value-identical
    # — bf16→f32 is exact). The reverse/middle outputs stay f32 either way.
    out_f32: bool = True

    def setup(self):
        down, up = [], []
        ch = self.channels
        for i in range(self.down_num):
            ch *= 4
            down.append([RNVPCoupling(ch, self.subnet, dtype=self.dtype,
                                      fused_st=self.fused_st, width=self.width)
                         for _ in range(self.block_num[i])])
        up_sched = list(self.block_num[:-1])[::-1] + [0]
        for i in range(self.down_num):
            ch //= 4
            up.append([RNVPCoupling(ch, self.subnet, dtype=self.dtype,
                                    fused_st=self.fused_st, width=self.width)
                       for _ in range(up_sched[i])])
        self.down_blocks = down
        self.up_blocks = up

    def _haar(self):
        if self.haar == "conv":
            return haar_downsample_conv, haar_upsample_conv
        if self.haar == "mixed":
            def down(x):
                return (haar_downsample_conv(x) if x.shape[-1] <= 64
                        else haar_downsample(x))

            def up(y):
                return (haar_upsample_conv(y) if y.shape[-1] <= 256
                        else haar_upsample(y))
            return down, up
        return haar_downsample, haar_upsample

    def forward(self, x):
        down, up = self._haar()
        if self.dtype is not None:
            x = x.astype(self.dtype)  # whole chain in compute dtype (AMP-style)
        for blocks in self.down_blocks:
            x = down(x)
            for b in blocks:
                x = b.forward(x)
        for blocks in self.up_blocks:
            x = up(x)
            for b in blocks:
                x = b.forward(x)
        return x if not self.out_f32 else x.astype(jnp.float32)

    def inverse(self, y) -> Tuple[jnp.ndarray, jnp.ndarray]:
        down, up = self._haar()
        if self.dtype is not None:
            y = y.astype(self.dtype)
        for blocks in reversed(self.up_blocks):
            for b in reversed(blocks):
                y = b.inverse(y)
            y = down(y)
        middle = y.astype(jnp.float32)
        for blocks in reversed(self.down_blocks):
            for b in reversed(blocks):
                y = b.inverse(y)
            y = up(y)
        y = y.astype(jnp.float32)
        if self.return_middle:
            return y, middle
        return y

    def __call__(self, x, rev: bool = False):
        return self.inverse(x) if rev else self.forward(x)


def squeeze2x(x, rev: bool = False):
    """RealNVP squeeze: (B,H,W,C) ↔ (B,H/2,W/2,4C) (invertible_net.py:47-88
    Squeeze/Unsqueeze; channel-block layout via space-to-depth)."""
    if not rev:
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


class Gaussianize(nn.Module):
    """RealNVP-style gaussianization head (invertible_net.py:91-119):
    z2 = (x2 − m)/e(s), x2 = m + z2·e(s) with (m, s) = DenseSubnet(x1)."""
    n_channels: int

    def setup(self):
        self.net = DenseSubnet(4 * self.n_channels)

    def __call__(self, x1, x2, rev: bool = False):
        h = self.net(x1)
        m, s = h[..., 0::2], h[..., 1::2]
        if not rev:
            return (x2 - m) / _e(s)
        return m + x2 * _e(s)
