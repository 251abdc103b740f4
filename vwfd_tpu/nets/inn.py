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

from ..ops.haar import haar_downsample, haar_upsample
from .blocks import scaled_glorot

_CLAMP = 1.0
_AFFINE_EPS = 1e-4


class DenseSubnet(nn.Module):
    """5-conv dense block, ELU, zero-init final (invertible_net.py:301-324)."""
    out_channels: int
    gc: int = 32

    @nn.compact
    def __call__(self, x):
        init = scaled_glorot(0.1)
        x1 = nn.elu(nn.Conv(self.gc, (3, 3), padding=1, kernel_init=init)(x))
        x2 = nn.elu(nn.Conv(self.gc, (3, 3), padding=1, kernel_init=init)(
            jnp.concatenate([x, x1], -1)))
        x3 = nn.elu(nn.Conv(self.gc, (3, 3), padding=1, kernel_init=init)(
            jnp.concatenate([x, x1, x2], -1)))
        x4 = nn.elu(nn.Conv(self.gc, (3, 3), padding=1, kernel_init=init)(
            jnp.concatenate([x, x1, x2, x3], -1)))
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       kernel_init=nn.initializers.zeros)(
            jnp.concatenate([x, x1, x2, x3, x4], -1))


class ResSubnet(nn.Module):
    """4×(conv64+ELU) then cat-skip + zero-init final conv
    (invertible_net.py:326-366)."""
    out_channels: int
    feature: int = 64

    @nn.compact
    def __call__(self, x):
        init = scaled_glorot(0.1)
        h = nn.elu(nn.Conv(self.feature, (3, 3), padding=1, kernel_init=init)(x))
        h = nn.elu(nn.Conv(self.feature, (3, 3), padding=1, kernel_init=init)(h))
        h = nn.elu(nn.Conv(self.feature, (3, 3), padding=1, kernel_init=init)(h))
        h = nn.elu(nn.Conv(self.feature, (3, 3), padding=1, kernel_init=init)(h))
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       kernel_init=nn.initializers.zeros)(
            jnp.concatenate([x, h], -1))


_SUBNETS = {"res": ResSubnet, "dense": DenseSubnet}


def _e(s):
    """Clamped multiplicative factor e(s)=exp(clamp·(2σ(s)−1))+ε
    (invertible_net.py:150-151)."""
    return jnp.exp(_CLAMP * (2.0 * nn.sigmoid(s) - 1.0)) + _AFFINE_EPS


class RNVPCoupling(nn.Module):
    """RealNVP affine coupling block (invertible_net.py:122-175)."""
    channels: int
    subnet: str = "res"

    def setup(self):
        split1 = self.channels // 2
        split2 = self.channels - split1
        sub = _SUBNETS[self.subnet]
        self.s1 = sub(split2)
        self.t1 = sub(split2)
        self.s2 = sub(split1)
        self.t2 = sub(split1)
        self._split1 = split1

    def forward(self, x):
        x1, x2 = x[..., :self._split1], x[..., self._split1:]
        y1 = _e(self.s2(x2)) * x1 + self.t2(x2)
        y2 = _e(self.s1(y1)) * x2 + self.t1(y1)
        return jnp.concatenate([y1, y2], -1)

    def inverse(self, y):
        y1, y2 = y[..., :self._split1], y[..., self._split1:]
        x2 = (y2 - self.t1(y1)) / _e(self.s1(y1))
        x1 = (y1 - self.t2(x2)) / _e(self.s2(x2))
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

    def setup(self):
        down, up = [], []
        ch = self.channels
        for i in range(self.down_num):
            ch *= 4
            down.append([RNVPCoupling(ch, self.subnet)
                         for _ in range(self.block_num[i])])
        up_sched = list(self.block_num[:-1])[::-1] + [0]
        for i in range(self.down_num):
            ch //= 4
            up.append([RNVPCoupling(ch, self.subnet)
                       for _ in range(up_sched[i])])
        self.down_blocks = down
        self.up_blocks = up

    def forward(self, x):
        for blocks in self.down_blocks:
            x = haar_downsample(x)
            for b in blocks:
                x = b.forward(x)
        for blocks in self.up_blocks:
            x = haar_upsample(x)
            for b in blocks:
                x = b.forward(x)
        return x

    def inverse(self, y) -> Tuple[jnp.ndarray, jnp.ndarray]:
        for blocks in reversed(self.up_blocks):
            for b in reversed(blocks):
                y = b.inverse(y)
            y = haar_downsample(y)
        middle = y
        for blocks in reversed(self.down_blocks):
            for b in reversed(blocks):
                y = b.inverse(y)
            y = haar_upsample(y)
        if self.return_middle:
            return y, middle
        return y

    def __call__(self, x, rev: bool = False):
        return self.inverse(x) if rev else self.forward(x)
