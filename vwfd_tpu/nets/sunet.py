"""SUNet — Swin-Transformer U-Net for forgery-mask segmentation (the tianchi
family). Reference: network/SUNet.py + network/SUNet_detail.py (patch embed,
window attention :59-156, SwinTransformerBlock :157, PatchMerging/UpSample,
dual up-sample head; consumed via `opt['SWINUNET']`, training.yaml:8-24).

TPU-native notes: window partition is pure reshape/transpose; shifted windows
use `jnp.roll` (static shifts); attention is batched einsum over
(num_windows·B, heads, tokens, dim) — MXU-friendly; all shapes static.
"""

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def window_partition(x, ws: int):
    """(B, H, W, C) → (B·nH·nW, ws, ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)


def window_reverse(windows, ws: int, h: int, w: int):
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (nW·B, N, C); mask: (nW, N, N) additive or None."""
        bnw, n, c = x.shape
        h = self.num_heads
        head_dim = c // h
        qkv = nn.Dense(3 * c, name="qkv")(x).reshape(bnw, n, 3, h, head_dim)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
        scale = head_dim ** -0.5

        # relative position bias (SUNet_detail.py WindowAttention)
        ws = self.window_size
        num_rel = (2 * ws - 1) ** 2
        table = self.param("rel_pos_bias",
                           nn.initializers.truncated_normal(0.02),
                           (num_rel, h))
        coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                      indexing="ij")).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = (rel + ws - 1)
        idx = rel[0] * (2 * ws - 1) + rel[1]
        bias = table[jnp.asarray(idx.reshape(-1))].reshape(n, n, h)
        bias = bias.transpose(2, 0, 1)[None]

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * scale + bias
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, h, n, n) + mask[None, :, None]
            attn = attn.reshape(bnw, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(bnw, n, c)
        return nn.Dense(c, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 8
    shift: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C)."""
        b, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        shift = self.shift if ws < min(h, w) else 0

        shortcut = x
        y = nn.LayerNorm(name="norm1")(x)
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            # attention mask for shifted windows (static, computed in numpy)
            img_mask = np.zeros((1, h, w, 1))
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                    img_mask[:, hs, wsl] = cnt
                    cnt += 1
            mw = window_partition(jnp.asarray(img_mask), ws).reshape(-1, ws * ws)
            attn_mask = jnp.where(mw[:, None, :] != mw[:, :, None], -100.0, 0.0)
        else:
            attn_mask = None
        wins = window_partition(y, ws).reshape(-1, ws * ws, c)
        attn = WindowAttention(c, self.num_heads, ws, name="attn")(wins, attn_mask)
        y = window_reverse(attn.reshape(-1, ws, ws, c), ws, h, w)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = shortcut + y

        z = nn.LayerNorm(name="norm2")(x)
        z = nn.Dense(int(c * self.mlp_ratio), name="fc1")(z)
        z = nn.gelu(z)
        z = nn.Dense(c, name="fc2")(z)
        return x + z


def pixel_shuffle(x, r: int):
    """torch.nn.PixelShuffle in NHWC: (B, H, W, C·r²) → (B, H·r, W·r, C) with
    torch's channel ordering (k = c·r² + i·r + j)."""
    b, h, w, cr2 = x.shape
    c = cr2 // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, H, r, W, r, C)
    return x.reshape(b, h * r, w * r, c)


class DualUpSample(nn.Module):
    """The exact dual up-sample of SUNet_detail.py:334-390 (UpSample):

      up_p: 1×1 conv (C→r²·C_out·?) → PReLU → PixelShuffle(r) → 1×1 conv
      up_b: 1×1 conv (C→C, bias) → PReLU → bilinear ×r → 1×1 conv (→C_out)
      out = 1×1 conv(concat([up_p, up_b]))    (no bias)

    factor 2: C_out = C/2 (decoder stages); factor 4: C_out = C (final head).
    """
    factor: int = 2

    @nn.compact
    def __call__(self, x):
        from ..ops.resize import resize_bilinear
        c = x.shape[-1]
        r = self.factor
        c_out = c // 2 if r == 2 else c
        # pixel-shuffle branch: conv lifts to r²·(c/2 | c) channels
        lift = 2 * c if r == 2 else 16 * c
        p = nn.Conv(lift, (1, 1), use_bias=False, name="up_p_conv1")(x)
        p = nn.PReLU()(p)
        p = pixel_shuffle(p, r)
        p = nn.Conv(c_out, (1, 1), use_bias=False, name="up_p_conv2")(p)
        # bilinear branch
        b_ = nn.Conv(c, (1, 1), name="up_b_conv1")(x)
        b_ = nn.PReLU()(b_)
        hh, ww = b_.shape[-3], b_.shape[-2]
        b_ = resize_bilinear(b_, (hh * r, ww * r))
        b_ = nn.Conv(c_out, (1, 1), use_bias=False, name="up_b_conv2")(b_)
        return nn.Conv(c_out, (1, 1), use_bias=False, name="fuse")(
            jnp.concatenate([p, b_], -1))


class SUNet(nn.Module):
    """Swin U-Net: conv patch-embed, Swin stages with PatchMerging down /
    dual-upsample up, skip connections, conv head."""
    out_channels: int = 1
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 8
    apply_sigmoid: bool = False

    @nn.compact
    def __call__(self, x):
        c0 = self.embed_dim
        # conv patch embedding (stride 4)
        h = nn.Conv(c0, (4, 4), strides=(4, 4), name="patch_embed")(x)
        h = nn.LayerNorm(name="embed_norm")(h)

        skips = []
        dims = [c0 * (2 ** i) for i in range(len(self.depths))]
        for i, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for d in range(depth):
                h = SwinBlock(dims[i], heads, self.window_size,
                              shift=0 if d % 2 == 0 else self.window_size // 2,
                              name=f"enc{i}_blk{d}")(h)
            if i < len(self.depths) - 1:
                skips.append(h)
                # PatchMerging: 2×2 space-to-depth + linear reduce
                b, hh, ww, cc = h.shape
                h = h.reshape(b, hh // 2, 2, ww // 2, 2, cc)
                h = h.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh // 2, ww // 2,
                                                          4 * cc)
                h = nn.Dense(2 * cc, use_bias=False, name=f"merge{i}")(
                    nn.LayerNorm(name=f"merge_norm{i}")(h))

        for i in reversed(range(len(self.depths) - 1)):
            # exact dual up-sample between decoder stages
            # (SUNet_detail.py:334-357 factor-2 branch)
            h = DualUpSample(factor=2, name=f"up{i}")(h)
            h = jnp.concatenate([h, skips[i]], -1)
            # concat_back_dim linear (SUNet_detail.py:654-656)
            h = nn.Dense(dims[i], name=f"fuse{i}")(h)
            for d in range(self.depths[i]):
                h = SwinBlock(dims[i], self.num_heads[i], self.window_size,
                              shift=0 if d % 2 == 0 else self.window_size // 2,
                              name=f"dec{i}_blk{d}")(h)

        # final ×4 dual up-sample head + 3×3 conv (SUNet_detail.py:680-685,
        # up_x4 :736-744, forward :747-753)
        h = nn.LayerNorm(name="norm_up")(h)
        h = DualUpSample(factor=4, name="up_final")(h)
        out = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                      name="head")(h)
        return nn.sigmoid(out) if self.apply_sigmoid else out
