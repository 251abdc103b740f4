"""Packed-space executor for the flagship INN (layout-stable embed).

Runs `InvertibleNet(subnet='res_tpu2', fused_st=True)` — the flagship embed
network (models/invertible_net.py:476-531 is the reference composite) — with
every <256-channel level held in SPACE-TO-DEPTH-PACKED layout at its
coupling-trunk resolution, instead of materializing the unpacked level
tensors between ops:

  * `ResSubnetTPUS2` is *defined* as s2d → trunk convs → head → d2s
    (nets/inn.py); the RNVP affine is elementwise, so it commutes with the
    packing permutation. Executing the whole level in packed space makes
    every per-subnet s2d/d2s pair disappear — the r3 profile shows exactly
    these 128²×48 tensors costing ~2.3 ms/step of XLA layout copies plus
    ~1 ms of permutation-conv time inside the 14.8 ms embed stage.
  * The packing uses a "c-major" channel order (packed channel = c·4 + g,
    g = 2·p + q the sub-pixel) so the coupling split x1/x2 and the head's
    s‖t split stay contiguous channel slices.
  * The learned convs absorb the order change at trace time: `Conv_0` and
    the head's first input rows are indexed with a fixed permutation, and
    the head's output columns are re-ordered — zero runtime cost, identical
    parameters (checkpoints interchange bit-for-bit with the module path).
  * Haar levels become fixed ORTHOGONAL transition convs that compose the
    Haar bank (ops/haar.py::_SIGNS) with the packing permutations:
    entry 4×4/s4, packed→packed 2×2/s2, packed→unpacked 1×1, and their
    exact transposes on the way up. ≥256-channel levels (res_tpu trunks,
    already at small spatial dims) stay unpacked, so the bottleneck
    `middle` tensor is bit-compatible with the module path.

Numerics: identical operations in a different association order — outputs
match the module path to accumulation rounding (exact permutations, Haar
±0.5 taps accumulated in f32; tests assert tight tolerances in f32 and
bf16). Selected via `ModelConfig.inn_packed` (models/video_model.py).
"""

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax, nn as jnn

from .inn import _e

# sign of Haar band k ∈ (LL, LH, HL, HH) at sub-pixel (p=row, q=col) —
# ops/haar.py::_SIGNS (invertible_net.py:188-199 grouped-conv bank)
_SIGNS = np.array(
    [
        [[1.0, 1.0], [1.0, 1.0]],
        [[1.0, -1.0], [1.0, -1.0]],
        [[1.0, 1.0], [-1.0, -1.0]],
        [[1.0, -1.0], [-1.0, 1.0]],
    ],
    np.float32,
)


def _g(p, q):
    return 2 * p + q


# ------------------------------------------------------------ fixed kernels
# All transitions are orthogonal (permutations ∘ the 0.5-scaled Haar bank),
# so the exact inverse kernel is the transpose, realized with the same
# transpose+flip recipe as ops/haar.py::_haar_kernel / ops/squeeze.py.


def _t(w):
    return np.ascontiguousarray(w.transpose(0, 1, 3, 2)[::-1, ::-1])


# NB: the kernel builders cache NUMPY arrays (never jnp — a cached device
# constant would leak tracers/buffers across jit traces) and the jnp
# conversion happens at the conv call site under the active trace.


@functools.lru_cache(maxsize=None)
def _entry_kernel(cin: int, transpose: bool):
    """(4,4,C,16C): unpacked (H,W,C) → packed level (H/4,W/4,16C): Haar↓
    then 2× space-to-depth, c-major packed order (c_out·4 + g) with
    c_out = c_in·4 + k."""
    w = np.zeros((4, 4, cin, 16 * cin), np.float32)
    for ci in range(cin):
        for k in range(4):
            for p in range(2):
                for q in range(2):
                    for u in range(2):
                        for v in range(2):
                            w[p * 2 + u, q * 2 + v, ci,
                              (ci * 4 + k) * 4 + _g(p, q)] = \
                                0.5 * _SIGNS[k][u, v]
    return w if not transpose else _t(w)


@functools.lru_cache(maxsize=None)
def _p2p_kernel(c: int, transpose: bool):
    """(2,2,4C,16C): packed level C (res r) → packed level 4C (res r/2).
    Composition unpack(P2⁻¹) ∘ Haar↓ ∘ pack(P2), all orders c-major."""
    w = np.zeros((2, 2, 4 * c, 16 * c), np.float32)
    for ci in range(c):
        for k in range(4):
            for g1 in range(4):           # sub-pixel inside the level-C pack
                for g2 in range(4):       # sub-pixel inside the level-4C pack
                    w[g2 // 2, g2 % 2, ci * 4 + g1,
                      ((ci * 4 + k) * 4 + g2)] = \
                        0.5 * _SIGNS[k][g1 // 2, g1 % 2]
    return w if not transpose else _t(w)


@functools.lru_cache(maxsize=None)
def _p2u_kernel(c: int, transpose: bool):
    """(1,1,4C,4C): packed level C (res r) → UNPACKED level 4C (res r):
    the Haar mix alone — the 2×2 spatial block it reads is exactly the four
    packed sub-pixels at one position."""
    w = np.zeros((1, 1, 4 * c, 4 * c), np.float32)
    for ci in range(c):
        for k in range(4):
            for g in range(4):
                w[0, 0, ci * 4 + g, ci * 4 + k] = \
                    0.5 * _SIGNS[k][g // 2, g % 2]
    return w if not transpose else _t(w)


def _fixed_conv(x, kern, stride):
    return lax.conv_general_dilated(
        x, jnp.asarray(kern, x.dtype), window_strides=(stride, stride),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST)


def _fixed_conv_t(x, kern, stride):
    return lax.conv_transpose(
        x, jnp.asarray(kern, x.dtype), strides=(stride, stride),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST)


# ------------------------------------------------------- packed subnet / st


@functools.lru_cache(maxsize=None)
def _cmajor_to_gmajor(ci4: int):
    """Permutation π with π[j] = (j%4)·Ci + j//4: our c-major packed channel
    j = c·4+g holds the value the reference s2d order (g·Ci + c) puts at
    π[j] — used to index the learned kernels' input rows."""
    ci = ci4 // 4
    return np.array([(j % 4) * ci + j // 4 for j in range(ci4)], np.int64)


@functools.lru_cache(maxsize=None)
def _head_colperm(c4: int):
    """Columns: head emits d2s order (g·C + c); we want c-major (c·4 + g)."""
    c = c4 // 4
    return np.array([(j % 4) * c + j // 4 for j in range(c4)], np.int64)


def _conv3x3(x, w, b, dt):
    if dt is not None:
        x, w, b = x.astype(dt), w.astype(dt), b.astype(dt)
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


def _conv1x1(x, w, b, dt):
    if dt is not None:
        x, w, b = x.astype(dt), w.astype(dt), b.astype(dt)
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


def _st_packed(p, xin, dt):
    """ResSubnetTPUS2 on a c-major packed input, s2d/d2s elided; returns the
    (s, t) pair as c-major packed contiguous halves."""
    ci4 = xin.shape[-1]
    perm = _cmajor_to_gmajor(ci4)
    w0 = p["Conv_0"]["kernel"][:, :, perm, :]
    h = jnn.elu(_conv3x3(xin, w0, p["Conv_0"]["bias"], dt))
    h = jnn.elu(_conv3x3(h, p["Conv_1"]["kernel"], p["Conv_1"]["bias"], dt))
    wh = p["Conv_2"]["kernel"]                     # (1,1, ci4+F, 4·C)
    # rows: the z-part of the concat is our c-major slice; the trunk part is
    # order-neutral
    wh = jnp.concatenate([wh[:, :, perm, :], wh[:, :, ci4:, :]], axis=2)
    colperm = _head_colperm(wh.shape[-1])
    wh = wh[..., colperm]
    bh = p["Conv_2"]["bias"][colperm]
    out = _conv1x1(jnp.concatenate([xin, h], -1), wh, bh, dt)
    half = out.shape[-1] // 2
    return out[..., :half], out[..., half:]


def _st_unpacked(p, xin, dt):
    """ResSubnetTPU (≥256-channel couplings) — plain spelling."""
    h = jnn.elu(_conv3x3(xin, p["Conv_0"]["kernel"], p["Conv_0"]["bias"], dt))
    h = jnn.elu(_conv3x3(h, p["Conv_1"]["kernel"], p["Conv_1"]["bias"], dt))
    out = _conv1x1(jnp.concatenate([xin, h], -1),
                   p["Conv_2"]["kernel"], p["Conv_2"]["bias"], dt)
    half = out.shape[-1] // 2
    return out[..., :half], out[..., half:]


def _coupling_fwd(p, z, packed, dt):
    half = z.shape[-1] // 2
    st = _st_packed if packed else _st_unpacked
    x1, x2 = z[..., :half], z[..., half:]
    s2, t2 = st(p["st2"], x2, dt)
    y1 = _e(s2) * x1 + t2
    s1, t1 = st(p["st1"], y1, dt)
    y2 = _e(s1) * x2 + t1
    return jnp.concatenate([y1, y2], -1)


def _coupling_inv(p, z, packed, dt):
    half = z.shape[-1] // 2
    st = _st_packed if packed else _st_unpacked
    y1, y2 = z[..., :half], z[..., half:]
    s1, t1 = st(p["st1"], y1, dt)
    x2 = (y2 - t1) / _e(s1)
    s2, t2 = st(p["st2"], x2, dt)
    x1 = (y1 - t2) / _e(s2)
    return jnp.concatenate([x1, x2], -1)


# ------------------------------------------------------------------- walks


def _levels(channels, down_num):
    """Per down level: (channels after Haar, packed?). Packed mirrors
    RNVPCoupling's subnet rule: res_tpu2 (⇒ packed) below 256 channels."""
    out, ch = [], channels
    for _ in range(down_num):
        ch *= 4
        out.append((ch, ch < 256))
    return out


def _down_transition(z, src_packed, dst_packed, src_c, dt):
    if not src_packed and not dst_packed:
        from ..ops.haar import haar_downsample_conv
        return haar_downsample_conv(z)
    if not src_packed and dst_packed:
        return _fixed_conv(z, _entry_kernel(src_c, False), 4)
    if src_packed and dst_packed:
        return _fixed_conv(z, _p2p_kernel(src_c, False), 2)
    return _fixed_conv(z, _p2u_kernel(src_c, False), 1)


def _up_transition(z, src_packed, dst_packed, dst_c, dt):
    """Exact inverse of `_down_transition(·, dst_packed, src_packed, dst_c)`
    — note src/dst swap: going up we invert the down map into dst_c."""
    if not dst_packed and not src_packed:
        from ..ops.haar import haar_upsample_conv
        return haar_upsample_conv(z)
    if not dst_packed and src_packed:
        return _fixed_conv_t(z, _entry_kernel(dst_c, True), 4)
    if dst_packed and src_packed:
        return _fixed_conv_t(z, _p2p_kernel(dst_c, True), 2)
    return _fixed_conv(z, _p2u_kernel(dst_c, True), 1)


def _blocks(params, name, i):
    out, b = [], 0
    while f"{name}_{i}_{b}" in params:
        out.append(params[f"{name}_{i}_{b}"])
        b += 1
    return out


def forward(params, x, *, channels=12, down_num=3, dtype=jnp.bfloat16,
            out_f32=True):
    """Packed-space equivalent of `InvertibleNet.forward` (nets/inn.py) for
    subnet='res_tpu2', fused_st=True. `params` is the module's param tree."""
    dt = dtype
    if dt is not None:
        x = x.astype(dt)
    levels = _levels(channels, down_num)
    packed, c = False, channels
    for i, (lc, lp) in enumerate(levels):
        x = _down_transition(x, packed, lp, c, dt)
        packed, c = lp, lc
        for p in _blocks(params, "down_blocks", i):
            x = _coupling_fwd(p, x, packed, dt)
    for i in range(down_num):
        dst_c = c // 4
        dst_packed = (dst_c < 256) and (i < down_num - 1)
        x = _up_transition(x, packed, dst_packed, dst_c, dt)
        packed, c = dst_packed, dst_c
        for p in _blocks(params, "up_blocks", i):
            x = _coupling_fwd(p, x, packed, dt)
    return x.astype(jnp.float32) if out_f32 else x


def inverse(params, y, *, channels=12, down_num=3, dtype=jnp.bfloat16,
            return_middle=True):
    """Packed-space equivalent of `InvertibleNet.inverse` — middle is the
    bottleneck tensor, which is UNPACKED (≥256-ch levels stay res_tpu),
    so it is directly comparable with the module path's."""
    dt = dtype
    if dt is not None:
        y = y.astype(dt)
    levels = _levels(channels, down_num)
    # walk back down through the up phase
    packed, c = False, channels
    for j in range(down_num - 1, -1, -1):
        for p in reversed(_blocks(params, "up_blocks", j)):
            y = _coupling_inv(p, y, packed, dt)
        dst_c = c * 4
        dst_packed = (dst_c < 256) and (j > 0)
        # inverse of the up-transition from (dst) to (current) = down map
        y = _down_transition(y, packed, dst_packed, c, dt)
        packed, c = dst_packed, dst_c
    middle = y.astype(jnp.float32)
    # walk back up through the down phase
    for j in range(down_num - 1, -1, -1):
        for p in reversed(_blocks(params, "down_blocks", j)):
            y = _coupling_inv(p, y, packed, dt)
        dst_c = c // 4
        dst_packed = (dst_c < 256) and (j > 0) and (levels[j - 1][1])
        y = _up_transition(y, packed, dst_packed, dst_c, dt)
        packed, c = dst_packed, dst_c
    y = y.astype(jnp.float32)
    if return_middle:
        return y, middle
    return y
