"""FBCNN (flexible blind JPEG restoration/simulation) + QF predictor —
reference: models/conditional_jpeg_generator.py (`FBCNN:202-375`,
`QF_predictor:697-827`). Used by the KD-JPEG (IRNrhi) family: FBCNN learns to
*simulate* real JPEG conditioned on QF, adversarially against a QF classifier.
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.pad import symm_pad
from ..ops.filters import bayar_constrain
from ..ops.resize import resize_bicubic


class _ResBlockCRC(nn.Module):
    """conv-ReLU-conv residual block (conditional_jpeg_generator.py ResBlock,
    mode 'CRC')."""
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), padding=1, name="c1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, name="c2")(h)
        return x + h


class _QFAttention(nn.Module):
    """FiLM-modulated residual block (conditional_jpeg_generator.py:185-200):
    x + (γ·resblock(x) + β)."""
    features: int

    @nn.compact
    def __call__(self, x, gamma, beta):
        h = nn.Conv(self.features, (3, 3), padding=1, name="c1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, name="c2")(h)
        return x + (gamma[:, None, None, :] * h + beta[:, None, None, :])


class FBCNN(nn.Module):
    """QF-conditioned U-shaped restorer/simulator (FBCNN:202-375).

    Returns (image, (m1, m2, m3, m4)) like the reference forward.
    `qf` is a (B, 1) scalar conditioning input.
    """
    nc: Sequence[int] = (32, 64, 128, 256)
    nb: int = 4
    out_channels: int = 3

    @nn.compact
    def __call__(self, x, qf):
        nc, nb = self.nc, self.nb
        # QF embedding → per-scale FiLM params (FBCNN:305-317)
        q = qf
        for i in range(3):
            q = nn.gelu(nn.Dense(512, name=f"qf_embed{i}")(q))
        gammas, betas = [], []
        for lvl, feats in ((3, nc[2]), (2, nc[1]), (1, nc[0])):
            gammas.append(nn.sigmoid(nn.Dense(feats, name=f"to_gamma_{lvl}")(q)))
            betas.append(nn.tanh(nn.Dense(feats, name=f"to_beta_{lvl}")(q)))
        g3, g2, g1 = gammas
        b3, b2, b1 = betas

        x1 = nn.Conv(nc[0], (3, 3), padding=1, name="head")(x)

        def down(z, feats, name):
            z = nn.Conv(feats, (2, 2), strides=(2, 2), name=f"{name}_down")(z)
            for i in range(nb):
                z = _ResBlockCRC(feats, name=f"{name}_res{i}")(z)
            return z

        x2 = down(x1, nc[1], "down1")
        x3 = down(x2, nc[2], "down2")
        x4 = down(x3, nc[2], "down3")

        m1 = x4
        for i in range(nb):
            m1 = _ResBlockCRC(nc[2], name=f"body{i}")(m1)
        h = m1 + x4

        def up(z, feats, g, b, name):
            z = nn.ConvTranspose(feats, (2, 2), strides=(2, 2),
                                 name=f"{name}_up")(z)
            for i in range(nb):
                z = _QFAttention(feats, name=f"{name}_attn{i}")(z, g, b)
            return z

        m2 = up(h, nc[2], g3, b3, "up3")
        h = m2 + x3
        m3 = up(h, nc[1], g2, b2, "up2")
        h = m3 + x2
        m4 = up(h, nc[0], g1, b1, "up1")
        h = m4 + x1
        out = nn.Conv(self.out_channels, (3, 3), padding=1, name="tail")(h)
        return out, (m1, m2, m3, m4)


class QFPredictor(nn.Module):
    """Bayar-front QF classifier / crop-apex regressor (QF_predictor:697-827).

    `crop_pred=False`: returns (bayar_features, class logits).
    `crop_pred=True`: returns (upsampled 1-ch mask logits, apex/class logits).
    """
    nc: Sequence[int] = (32, 64, 128, 256)
    nb: int = 4
    classes: int = 5
    crop_pred: bool = False
    out_size: int = 512

    @nn.compact
    def __call__(self, x):
        bayar_kernel = self.param("bayar_kernel",
                                  nn.initializers.kaiming_normal(),
                                  (5, 5, x.shape[-1], 3))
        bk = bayar_constrain(bayar_kernel)
        xp = symm_pad(x, (2, 2, 2, 2))
        e0 = jax.lax.conv_general_dilated(
            xp, bk, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

        nc, nb = self.nc, self.nb
        h = nn.Conv(nc[0], (3, 3), padding=1, name="head")(e0)

        def stage(z, feats_in, feats_out, name):
            for i in range(nb):
                z = _ResBlockCRC(feats_in, name=f"{name}_res{i}")(z)
            return nn.Conv(feats_out, (2, 2), strides=(2, 2),
                           name=f"{name}_down")(z)

        h = stage(h, nc[0], nc[1], "down1")
        h = stage(h, nc[1], nc[2], "down2")
        h = stage(h, nc[2], 192, "down3")
        for i in range(nb):
            h = _ResBlockCRC(192, name=f"body{i}")(h)

        if self.crop_pred:
            img = nn.Conv(1, (1, 1), use_bias=False, name="to_img")(h)
            q = jnp.mean(h, axis=(1, 2))
            q = nn.gelu(nn.Dense(192, name="qf0")(q))
            q = nn.gelu(nn.Dense(192, name="qf1")(q))
            q = nn.Dense(self.classes, name="qf2")(q)
            img = resize_bicubic(img, (self.out_size, self.out_size))
            return img, q
        hq = h
        for i in range(nb):
            hq = _ResBlockCRC(192, name=f"qf_res{i}")(hq)
        q = jnp.mean(hq, axis=(1, 2))
        q = nn.gelu(nn.Dense(192, name="qf0")(q))
        q = nn.gelu(nn.Dense(192, name="qf1")(q))
        q = nn.Dense(self.classes, name="qf2")(q)
        return e0, q
