"""Shared building blocks (Flax linen, NHWC).

Initialization parity with the reference (models/invertible_net.py:7-44):
xavier-normal × 0.1 for coupling-subnet inner convs, zeros for final convs,
kaiming-normal (fan_in) elsewhere.
"""

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


def scaled_glorot(scale: float = 0.1):
    base = nn.initializers.glorot_normal()

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale
    return init


def scaled_kaiming(scale: float = 1.0):
    base = nn.initializers.kaiming_normal()

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale
    return init


class SNConv(nn.Module):
    """2-D (transposed/dilated) convolution with optional spectral normalization.

    The reference wraps discriminator/localizer convs in
    `nn.utils.spectral_norm` (models/networks.py:1380-1384), where torch
    updates the power-iteration vector as a forward side effect. Here the
    vector lives in the `spectral` mutable collection; pass `update_sn=True`
    (training) to refresh it, leave False for frozen inference.
    """
    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    dilation: int = 1
    use_bias: bool = True
    use_spectral_norm: bool = True
    transpose: bool = False
    kernel_init: Callable = nn.initializers.kaiming_normal()

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,)) if self.use_bias else None

        if self.use_spectral_norm:
            mat = kernel.reshape(-1, self.features)
            u = self.variable("spectral", "u",
                              lambda: jnp.ones((mat.shape[0],), jnp.float32)
                              / jnp.sqrt(mat.shape[0]))
            v = mat.T @ u.value
            v = v / (jnp.linalg.norm(v) + 1e-12)
            u_new = mat @ v
            u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
            sigma = u_new @ mat @ v
            if update_sn and not self.is_initializing():
                u.value = jax.lax.stop_gradient(u_new)
            kernel = kernel / (jax.lax.stop_gradient(sigma) + 1e-12)

        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        if self.transpose:
            y = jax.lax.conv_transpose(
                x, kernel, strides=tuple(self.strides), padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            y = jax.lax.conv_general_dilated(
                x, kernel, window_strides=tuple(self.strides), padding=pad,
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            y = y + bias
        return y


class ResnetBlock(nn.Module):
    """Dilated residual block with reflection padding + GELU
    (models/networks.py:1387-1419) — the localizer's middle stage."""
    dim: int
    dilation: int = 2
    use_spectral_norm: bool = True

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        d = self.dilation
        h = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)), mode="reflect")
        h = SNConv(self.dim, (3, 3), padding="VALID", dilation=d,
                   use_bias=not self.use_spectral_norm,
                   use_spectral_norm=self.use_spectral_norm, name="conv1")(h, update_sn)
        h = nn.gelu(h)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        h = SNConv(self.dim, (3, 3), padding="VALID",
                   use_bias=not self.use_spectral_norm,
                   use_spectral_norm=self.use_spectral_norm, name="conv2")(h, update_sn)
        return x + h


class ConvBNRelu(nn.Module):
    """Conv→BatchNorm→ReLU (hidden_models/conv_bn_relu.py:4-18)."""
    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=1, kernel_init=nn.initializers.kaiming_normal())(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return nn.relu(x)
