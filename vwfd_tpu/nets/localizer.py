"""UNetDiscriminator — the tamper localizer (models/networks.py:896-1113).

SRM + Bayar fixed-filter forensic front-end, spectral-norm U-Net body with
dilated residual middle stage, optional QF-FiLM attention, sigmoid mask head.

TPU notes: the Bayar constraint is applied *functionally* to the kernel each
call (the reference mutates `weight.data` in-place every forward,
networks.py:1058-1061); the SRM bank is the fixed constant bank from
ops/filters.py (the reference loads the same weights from `MantraNetv4.pt`).
"""

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.filters import srm_conv, bayar_constrain
from ..ops.pad import symm_pad
from .blocks import SNConv, ResnetBlock


class UNetDiscriminator(nn.Module):
    in_channels: int = 3
    out_channels: int = 1
    residual_blocks: int = 2
    dim: int = 16
    use_spectral_norm: bool = True
    use_srm: bool = True
    use_sigmoid: bool = True
    with_qf_attn: bool = False

    @nn.compact
    def __call__(self, x, qf: Optional[jnp.ndarray] = None,
                 update_sn: bool = False):
        d = self.dim
        if self.use_srm:
            # symm-pad so the three VALID 5×5 banks give 'same' output
            xp = symm_pad(x, (2, 2, 2, 2))
            conv_init = nn.Conv(d - 12, (5, 5), padding="VALID", use_bias=False,
                                kernel_init=nn.initializers.kaiming_normal(),
                                name="init_conv")(xp)
            bayar_kernel = self.param(
                "bayar_kernel", nn.initializers.kaiming_normal(),
                (5, 5, x.shape[-1], 3))
            bk = bayar_constrain(bayar_kernel)
            conv_bayar = jax.lax.conv_general_dilated(
                xp, bk, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            conv_srm = srm_conv(xp)
            e0 = nn.gelu(jnp.concatenate([conv_init, conv_srm, conv_bayar], -1))
        else:
            h = SNConv(d, (3, 3), use_spectral_norm=self.use_spectral_norm,
                       name="init_a")(x, update_sn)
            h = nn.gelu(h)
            h = SNConv(d, (3, 3), use_spectral_norm=self.use_spectral_norm,
                       name="init_b")(h, update_sn)
            e0 = nn.gelu(h)

        def stage(z, feats, name):
            z = SNConv(feats, (4, 4), strides=(2, 2), padding=1,
                       use_spectral_norm=self.use_spectral_norm,
                       name=f"{name}_down")(z, update_sn)
            z = nn.gelu(z)
            z = SNConv(feats, (3, 3), use_spectral_norm=self.use_spectral_norm,
                       name=f"{name}_conv")(z, update_sn)
            return nn.gelu(z)

        e1 = stage(e0, d * 2, "enc1")
        e2 = stage(e1, d * 4, "enc2")

        m = e2
        for i in range(self.residual_blocks):
            m = ResnetBlock(d * 4, dilation=2,
                            use_spectral_norm=self.use_spectral_norm,
                            name=f"res{i}")(m, update_sn)

        if self.with_qf_attn:
            q = qf
            for i in range(3):
                q = nn.relu(nn.Dense(512, name=f"qf_embed{i}")(q))
            def film(feats, name):
                gamma = nn.sigmoid(nn.Dense(feats, name=f"{name}_g")(q))
                beta = nn.tanh(nn.Dense(feats, name=f"{name}_b")(q))
                return gamma[:, None, None, :], beta[:, None, None, :]

            def attn(z, feats, name):
                zp = jnp.pad(z, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
                return nn.Conv(feats, (7, 7), padding="VALID", name=name)(zp)

            g3, b3 = film(d * 4, "film3")
            m = g3 * attn(m, d * 4, "attn3") + b3

        def up(z, skip, feats, name):
            z = jnp.concatenate([skip, z], -1)
            # "SAME" here ≡ torch ConvTranspose2d(k=4, s=2, p=1): exact 2×
            z = SNConv(feats, (4, 4), strides=(2, 2), padding="SAME",
                       transpose=True,
                       use_spectral_norm=self.use_spectral_norm,
                       name=f"{name}_up")(z, update_sn)
            z = nn.gelu(z)
            z = SNConv(feats, (3, 3), use_spectral_norm=self.use_spectral_norm,
                       name=f"{name}_conv")(z, update_sn)
            return nn.gelu(z)

        d2 = up(m, e2, d * 2, "dec2")
        if self.with_qf_attn:
            g2, b2 = film(d * 2, "film2")
            d2 = g2 * attn(d2, d * 2, "attn2") + b2
        d1 = up(d2, e1, d, "dec1")
        if self.with_qf_attn:
            g1, b1 = film(d, "film1")
            d1 = g1 * attn(d1, d, "attn1") + b1
        out = nn.Conv(self.out_channels, (1, 1), name="head")(
            jnp.concatenate([e0, d1], -1))
        if self.use_sigmoid:
            out = nn.sigmoid(out)
        return out, (d2, d1)
