"""Tamper-mask predictors (`generator` in the flagship IRNcrop model).

`UNet` is the reference-exact textbook U-Net (network/UNet.py:7-98): encoder
×4 (double conv+BN+ReLU, maxpool), bottleneck, decoder ×4 with transposed-conv
upsampling and skip concatenation, 1×1 conv + sigmoid head. Its checkpoint
layout interchanges with converted reference weights.

`UNetTPU` is the TPU-first re-shape of the same design (see its docstring) —
the flagship/bench extractor once localization parity was shown
(BASELINE.md r3 convergence table).
"""

import jax.numpy as jnp
import flax.linen as nn
from jax import lax


class _DoubleConv(nn.Module):
    features: int
    dtype: object = None
    convs: int = 2  # UNetTPU(enc_convs=1) shrinks encoder levels to one conv

    @nn.compact
    def __call__(self, x, train: bool = True):
        for _ in range(self.convs):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                        kernel_init=nn.initializers.kaiming_normal(),
                        dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class _UpParams(nn.Module):
    """Declares the exact nn.ConvTranspose param tree ({kernel, bias}) so the
    fast-upsample GEMM path interchanges checkpoints with the reference
    layout."""
    cin: int
    feats: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (2, 2, self.cin, self.feats))
        b = self.param("bias", nn.initializers.zeros, (self.feats,))
        return k, b


class _HeadParams(nn.Module):
    """Declares the exact nn.Conv param tree ({kernel, bias}, same inits) so
    the composed-transposed-conv head interchanges checkpoints with the
    1×1-conv spelling."""
    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, self.cin, self.cout))
        b = self.param("bias", nn.initializers.zeros, (self.cout,))
        return k, b


class _SplitConcatConv(nn.Module):
    """`conv(concat([a, b]), K)` evaluated as `conv(a, K[:, :, :ca]) +
    conv(b, K[:, :, ca:])` — the concat operand is never materialized.
    Same param tree as the nn.Conv spelling (one HWIO kernel, same init)."""
    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, a, b):
        ca, cb = a.shape[-1], b.shape[-1]
        kern = self.param("kernel", nn.initializers.kaiming_normal(),
                          (3, 3, ca + cb, self.features))
        if self.dtype is not None:
            kern = kern.astype(self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        ya = lax.conv_general_dilated(a, kern[:, :, :ca], (1, 1),
                                      ((1, 1), (1, 1)), dimension_numbers=dn)
        yb = lax.conv_general_dilated(b, kern[:, :, ca:], (1, 1),
                                      ((1, 1), (1, 1)), dimension_numbers=dn)
        return ya + yb


class UNet(nn.Module):
    out_channels: int = 1
    init_features: int = 32
    apply_sigmoid: bool = True
    dtype: object = None  # compute dtype; params/output stay f32
    # Evaluate the 2×2/s2 ConvTranspose as ONE 1×1 GEMM (Cin → 4·Cout) +
    # depth-to-space — EXACTLY the same operator, same param tree,
    # golden-tested vs nn.ConvTranspose. MEASURED SLOWER in the r2 pipeline
    # (1768 vs 1941 fps: the depth-to-space reshuffle breaks XLA fusion), so
    # the default stays on XLA's ConvTranspose lowering.
    fast_upsample: bool = False

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
            if not self.fast_upsample:
                return nn.ConvTranspose(feats, (2, 2), strides=(2, 2),
                                        dtype=dt, name=name)(z)
            cin = z.shape[-1]
            kern, bias = _UpParams(cin, feats, name=name)()
            # flax ConvTranspose applies the kernel spatially FLIPPED:
            # out[2i+di, 2j+dj, o] = z[i,j] @ K[1-di, 1-dj, :, o]. One GEMM
            # with column order (o, di, dj), then o-major depth-to-space.
            w2 = kern[::-1, ::-1].transpose(2, 3, 0, 1).reshape(cin, feats * 4)
            if dt is not None:
                z, w2 = z.astype(dt), w2.astype(dt)
            h = z @ w2
            b, hh, ww, _ = h.shape
            h = h.reshape(b, hh, ww, feats, 2, 2)
            h = h.transpose(0, 1, 4, 2, 5, 3)
            h = h.reshape(b, hh * 2, ww * 2, feats)
            return h + bias.astype(h.dtype)

        d4 = _DoubleConv(f * 8, dtype=dt, name="dec4")(
            jnp.concatenate([up(bott, f * 8, "up4"), enc4], -1), train)
        d3 = _DoubleConv(f * 4, dtype=dt, name="dec3")(
            jnp.concatenate([up(d4, f * 4, "up3"), enc3], -1), train)
        d2 = _DoubleConv(f * 2, dtype=dt, name="dec2")(
            jnp.concatenate([up(d3, f * 2, "up2"), enc2], -1), train)
        d1 = _DoubleConv(f, dtype=dt, name="dec1")(
            jnp.concatenate([up(d2, f, "up1"), enc1], -1), train)
        # head runs in the compute dtype (a full-res f32 conv costs ~1.6 ms
        # per 128-frame step — r3 profile); logits cast back to f32
        out = nn.Conv(self.out_channels, (1, 1), dtype=dt, name="head")(d1)
        out = out.astype(jnp.float32)
        return nn.sigmoid(out) if self.apply_sigmoid else out


class UNetTPU(nn.Module):
    """TPU-first tamper-mask extractor.

    Same encoder/decoder-with-skips design as the reference UNet
    (network/UNet.py:7-98), re-shaped for the MXU's 128-lane output dim —
    the r3 profile showed the reference's 32-feature plan caps its high-res
    convolutions at 25-50% MXU utilization (output channels < 128 lanes),
    making the extractor the most expensive pipeline stage (BASELINE.md):

      * space-to-depth stem (factor `s2d`): 256²×3 → 128²×12, so the network
        never convolves at full resolution with tiny channel counts;
      * channel plan f·(1,2,4,8) + f·16 bottleneck with f=64: every level
        from the second down fills the 128 output lanes;
      * single-conv decoder stages (the second 3×3 of each reference decoder
        level adds FLOPs at the worst utilization; localization quality is
        validated by the convergence run, BASELINE.md r3);
      * the head predicts s2d-packed logits (s2d²·out_channels at 128²) and
        depth-to-space unpacks to the input resolution — no full-res conv.

    Mask semantics, training recipe and loss interface are identical to
    `UNet`; it is selected by `ModelConfig.extractor = "unet_tpu"`.
    """
    out_channels: int = 1
    init_features: int = 64
    s2d: int = 2
    apply_sigmoid: bool = True
    dtype: object = None  # compute dtype; params/output stay f32
    # 1×1-project each encoder skip to half its channels before the decoder
    # concat: the decoder 3×3s (60% of the net's FLOPs) see 1.5c instead of
    # 2c input channels (−25% decoder FLOPs for a ~c²·HW projection). Off by
    # default until convergence parity is shown (ModelConfig.extractor
    # 'unet_tpu_slim' selects it).
    slim_skip: bool = False
    # Encoder convs per level. 1 = single-conv encoder ("unet_tpu2"): the r3
    # cost analysis shows the extractor carries 2× the embed INN's FLOPs and
    # the second encoder conv of each level is ~70% of encoder cost; the
    # decoder already runs single-conv stages. Convergence-validated in
    # BASELINE.md r3 before becoming anyone's default. A 5-tuple gives a
    # per-level plan (enc1..enc4, bottleneck) for finer frontier points,
    # e.g. (2, 1, 1, 1, 1) keeps the high-res double conv and slims the rest.
    enc_convs: object = 2
    # Stem/head squeezes as fixed permutation convs (ops/squeeze.py) instead
    # of reshape+transpose — bit-identical, avoids XLA layout copies at the
    # net's highest-resolution tensors (see the r3 embed layout study).
    conv_squeeze: bool = True
    # Head lowering. "d2s": 1×1 conv to s²·out channels + depth-to-space
    # (the r3 profile shows XLA schedules this 4-lane conv at ~6× its bytes
    # roof — 1.99 ms of the 15.6 ms extract stage). "convt": the SAME affine
    # map — head∘d2s composed at trace time into one s×s stride-s transposed
    # conv (plus the per-subpixel bias the composition implies) — identical
    # params, bit-identical output, no 4-lane intermediate.
    head_impl: str = "d2s"
    # Decoder-upsample lowering. "convt": nn.ConvTranspose 2×2/s2 (XLA's
    # input-dilated conv). "gemm": the SAME operator evaluated as one 1×1
    # GEMM (cin → 4·feats, subpixel-major columns) + the conv-expressed
    # depth-to-space of ops/squeeze.py — identical params (kernel flip
    # convention of flax ConvTranspose honored), numerically identical map.
    up_impl: str = "convt"
    # Decoder-conv lowering. "concat": 3×3 conv over concat([up, skip]).
    # "split": the SAME conv as conv(up, K[:, :, :cu]) + conv(skip,
    # K[:, :, cu:]) — the concat is never materialized; identical param tree
    # (one (3,3,cu+cs,f) kernel at the same path) and identical output up to
    # f32 summation-order rounding.
    dec_impl: str = "concat"

    @nn.compact
    def __call__(self, x, train: bool = True):
        from ..ops.squeeze import depth_to_space_conv, space_to_depth_conv
        f, s = self.init_features, self.s2d
        dt = self.dtype
        b, h, w, c = x.shape
        if dt is not None:
            x = x.astype(dt)
        # space-to-depth stem
        if self.conv_squeeze:
            x = space_to_depth_conv(x, s)
        else:
            x = x.reshape(b, h // s, s, w // s, s, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, h // s, w // s, s * s * c)

        ec = (tuple(self.enc_convs) if not isinstance(self.enc_convs, int)
              else (self.enc_convs,) * 5)
        assert len(ec) == 5, "enc_convs plan is (enc1..enc4, bottleneck)"
        enc1 = _DoubleConv(f, dtype=dt, convs=ec[0], name="enc1")(x, train)
        enc2 = _DoubleConv(f * 2, dtype=dt, convs=ec[1], name="enc2")(
            nn.max_pool(enc1, (2, 2), (2, 2)), train)
        enc3 = _DoubleConv(f * 4, dtype=dt, convs=ec[2], name="enc3")(
            nn.max_pool(enc2, (2, 2), (2, 2)), train)
        enc4 = _DoubleConv(f * 8, dtype=dt, convs=ec[3], name="enc4")(
            nn.max_pool(enc3, (2, 2), (2, 2)), train)
        bott = _DoubleConv(f * 16, dtype=dt, convs=ec[4], name="bottleneck")(
            nn.max_pool(enc4, (2, 2), (2, 2)), train)

        def up(z, feats, name):
            if self.up_impl == "gemm":
                cin = z.shape[-1]
                kern, bias = _UpParams(cin, feats, name=name)()
                # flax ConvTranspose: out[2i+p, 2j+q, o] = z[i,j] @
                # K[1-p, 1-q, :, o]; pack GEMM columns subpixel-major
                # ((p·2+q)·feats + o) to match depth_to_space_conv's order.
                w2 = kern[::-1, ::-1].transpose(2, 0, 1, 3).reshape(
                    cin, 4 * feats)
                if dt is not None:
                    z, w2 = z.astype(dt), w2.astype(dt)
                h = depth_to_space_conv(z @ w2, 2)
                return h + bias.astype(h.dtype)
            return nn.ConvTranspose(feats, (2, 2), strides=(2, 2), dtype=dt,
                                    name=name)(z)

        def dec(z, skip, feats, name):
            if self.slim_skip:
                skip = nn.Conv(skip.shape[-1] // 2, (1, 1), use_bias=False,
                               dtype=dt, name=f"{name}_skipproj")(skip)
            if self.dec_impl == "split":
                z = _SplitConcatConv(feats, dtype=dt,
                                     name=f"{name}_conv")(z, skip)
            else:
                z = jnp.concatenate([z, skip], -1)
                z = nn.Conv(feats, (3, 3), padding=1, use_bias=False,
                            kernel_init=nn.initializers.kaiming_normal(),
                            dtype=dt, name=f"{name}_conv")(z)
            z = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=dt, name=f"{name}_bn")(z)
            return nn.relu(z)

        d4 = dec(up(bott, f * 8, "up4"), enc4, f * 8, "dec4")
        d3 = dec(up(d4, f * 4, "up3"), enc3, f * 4, "dec3")
        d2 = dec(up(d3, f * 2, "up2"), enc2, f * 2, "dec2")
        d1 = dec(up(d2, f, "up1"), enc1, f, "dec1")

        # s2d-packed head + depth-to-space back to the input resolution
        if self.head_impl == "convt":
            # Same params and same affine map as the d2s spelling, composed
            # at trace time: out[:, s·i+p, s·j+q, c] =
            #   d1[:, i, j] @ K[0,0,:, (p·s+q)·C+c] + bias[(p·s+q)·C+c].
            # As one s×s stride-s transposed conv the 4-lane packed-logit
            # intermediate never exists (it measured 6× its bytes roof).
            cin, C = d1.shape[-1], self.out_channels
            kern, bias = _HeadParams(cin, C * s * s, name="head")()
            w2 = kern[0, 0].reshape(cin, s, s, C)
            # flip convention matches ops/squeeze.py::_s2d_kernel(transpose)
            kt = w2.transpose(1, 2, 0, 3)[::-1, ::-1]
            if dt is not None:
                kt = kt.astype(dt)
            out = lax.conv_transpose(d1, kt, strides=(s, s), padding="VALID",
                                     dimension_numbers=("NHWC", "HWIO",
                                                        "NHWC"))
            bgrid = bias.reshape(s, s, C).astype(out.dtype)
            out = out + jnp.tile(bgrid, (out.shape[1] // s,
                                         out.shape[2] // s, 1))
        else:
            out = nn.Conv(self.out_channels * s * s, (1, 1), dtype=dt,
                          name="head")(d1)
            if self.conv_squeeze:
                out = depth_to_space_conv(out, s)
            else:
                hh, ww = out.shape[1], out.shape[2]
                out = out.reshape(b, hh, ww, s, s, self.out_channels)
                out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, hh * s, ww * s, self.out_channels)
        out = out.astype(jnp.float32)
        return nn.sigmoid(out) if self.apply_sigmoid else out
