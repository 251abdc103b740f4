"""Int8 post-training-quantization serving path for the packed INN embed.

After the int8 extractor landed (nets/unet_int8.py), the embed INN became
the largest remaining bf16 stage of the serving pipeline (Sembed 9.2 ms at
the packed point, BASELINE.md r3) — and its FLOPs are almost entirely the
coupling subnets' 3×3 trunk convs and 1×1 fused s‖t heads, exactly the op
class the v5e MXU runs at ~2× rate in int8. This module converts the
trained flagship embed (`InvertibleNet(subnet='res_tpu2', fused_st=True)`
executed by nets/inn_packed.py) to an int8 inference program:

  * **Only the learned convs quantize.** The fixed orthogonal transition
    convs (entry/p2p/p2u — cheap, and exactness there preserves the Haar
    algebra) and the RNVP affine `y = e(s)·x + t` (elementwise VPU work)
    stay in bf16/f32, so the invertibility structure is untouched.
  * **Per-output-channel symmetric int8 weights** (scale = amax/127), on
    the *trace-time-permuted* kernels — the packed executor's c-major
    row/column permutations (inn_packed.py::_st_packed) are applied to the
    f32 kernels first, then quantized, so the int8 program needs no
    runtime permutes either.
  * **Calibrated per-tensor activation scales** at every subnet's three
    quant points (its input, and the two ELU trunk outputs), collected by
    running the f32 packed walk over representative embed inputs. ELU
    outputs are signed ([−127, 127]); so are coupling activations.
  * **Split fused head** — `conv1x1(concat([x, h]))` evaluates as
    `conv(x, W[:cx]) + conv(h, W[cx:])` so the two operands keep their own
    activation scales (exact kernel slicing, one shared per-output-channel
    weight-scale vector, mirroring the unet_int8 decoder).
  * **Fused epilogues** — each conv's rescale+bias(+ELU)+requant is one
    per-channel multiply-add + elu + round + clip on the int32 accumulator
    (`m = s_in·s_w`, requant divides by the next point's scale; ELU is
    nonlinear so the division cannot fold into `m` — it is one extra VPU
    multiply).

Training stays bf16; this is an inference/deployment artifact selected by
`WatermarkServer(int8_embed=True)` or `bench.py --int8-embed`, and
quality-gated on a trained checkpoint by tools/exp_int8_eval.py
(--int8-embed): the gate is downstream — embedded-image PSNR vs the bf16
embed AND extraction F1 through the full attack pipeline.

Reference context: the torch repo's embed is the fp32/AMP INN forward
inside its trainers (models/IRNcrop_model.py:325-451, invertible_net.py
:476-531); it has no quantized inference path.
"""

from typing import Dict, Iterable, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .inn import _e
from .inn_packed import (_cmajor_to_gmajor, _down_transition, _head_colperm,
                         _levels, _up_transition)

__all__ = ["collect_amax", "calibrate", "quantize", "forward_int8"]


# --------------------------------------------------------------- block walk


def _block_keys(tree, name, i):
    out, b = [], 0
    while f"{name}_{i}_{b}" in tree:
        out.append(f"{name}_{i}_{b}")
        b += 1
    return out


def _walk(tree, x, st_apply, channels, down_num, dtype):
    """The packed-executor forward walk (inn_packed.py::forward) with the
    subnet evaluation abstracted: ``st_apply(block_params_or_q, 'st1'|'st2',
    xin, packed) -> (s, t)``. Transitions/affines run in ``dtype``."""

    def coupling(p, z):
        half = z.shape[-1] // 2
        x1, x2 = z[..., :half], z[..., half:]
        s2, t2 = st_apply(p, "st2", x2, packed)
        y1 = (_e(s2) * x1.astype(jnp.float32) + t2).astype(z.dtype)
        s1, t1 = st_apply(p, "st1", y1, packed)
        y2 = (_e(s1) * x2.astype(jnp.float32) + t1).astype(z.dtype)
        return jnp.concatenate([y1, y2], -1)

    if dtype is not None:
        x = x.astype(dtype)
    levels = _levels(channels, down_num)
    packed, c = False, channels
    for i, (lc, lp) in enumerate(levels):
        x = _down_transition(x, packed, lp, c, dtype)
        packed, c = lp, lc
        for k in _block_keys(tree, "down_blocks", i):
            x = coupling(tree[k], x)
    for i in range(down_num):
        dst_c = c // 4
        dst_packed = (dst_c < 256) and (i < down_num - 1)
        x = _up_transition(x, packed, dst_packed, dst_c, dtype)
        packed, c = dst_packed, dst_c
        for k in _block_keys(tree, "up_blocks", i):
            x = coupling(tree[k], x)
    return x.astype(jnp.float32)


# ------------------------------------------------- permuted f32 kernel prep


def _prep(p, packed):
    """The subnet's f32 kernels with the packed executor's trace-time
    permutations applied and the fused head split into its x/h operands.
    Returns ``(w0, b0, w1, b1, w2x, w2h, b2)``; row/col orders match what
    inn_packed's own convs consume, so quantizing THESE kernels yields an
    int8 program needing no runtime permutes."""
    w0 = jnp.asarray(p["Conv_0"]["kernel"], jnp.float32)
    b0 = jnp.asarray(p["Conv_0"]["bias"], jnp.float32)
    w1 = jnp.asarray(p["Conv_1"]["kernel"], jnp.float32)
    b1 = jnp.asarray(p["Conv_1"]["bias"], jnp.float32)
    wh = jnp.asarray(p["Conv_2"]["kernel"], jnp.float32)
    bh = jnp.asarray(p["Conv_2"]["bias"], jnp.float32)
    ci = w0.shape[2]
    if packed:
        perm = _cmajor_to_gmajor(ci)
        w0 = w0[:, :, perm, :]
        wh = jnp.concatenate([wh[:, :, perm, :], wh[:, :, ci:, :]], axis=2)
        colperm = _head_colperm(wh.shape[-1])
        wh, bh = wh[..., colperm], bh[colperm]
    return w0, b0, w1, b1, wh[:, :, :ci, :], wh[:, :, ci:, :], bh


def _conv_f32(x, w, pad):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# ------------------------------------------------------------- calibration


def collect_amax(params, x, *, channels=12, down_num=3):
    """F32 packed-walk forward recording each subnet's three quant-point
    absolute maxima. Returns ``(y, {block: {st: [a_x, a_h0, a_h1]}})``."""
    amax: Dict[str, Dict[str, List]] = {}

    def st(p, name, xin, packed):
        w0, b0, w1, b1, w2x, w2h, b2 = _prep(p[name], packed)
        xf = xin.astype(jnp.float32)
        h0 = jax.nn.elu(_conv_f32(xf, w0, 1) + b0)
        h1 = jax.nn.elu(_conv_f32(h0, w1, 1) + b1)
        out = _conv_f32(xf, w2x, 0) + _conv_f32(h1, w2h, 0) + b2
        rec = [jnp.max(jnp.abs(xf)), jnp.max(jnp.abs(h0)),
               jnp.max(jnp.abs(h1))]
        amax.setdefault(_key(p), {})[name] = rec
        half = out.shape[-1] // 2
        return out[..., :half], out[..., half:]

    keyed = {k: dict(v, __key__=k) for k, v in params.items()}

    def _key(p):
        return p["__key__"]

    y = _walk(keyed, x, st, channels, down_num, None)
    return y, amax


def calibrate(params, batches: Iterable, *, channels=12, down_num=3,
              margin: float = 1.0) -> Dict:
    """Per-tensor activation scales from representative embed inputs.

    ``batches`` iterates (N, H, W, channels) arrays — what the model's
    embed feeds the INN (frame→channel-transposed clips in [0,1],
    models/video_model.py::_to_channels). Scales are
    ``margin · max-over-batches(amax) / 127``."""
    run = jax.jit(lambda v: collect_amax(params, v, channels=channels,
                                         down_num=down_num)[1])
    agg = None
    for v in batches:
        a = jax.tree_util.tree_map(float, run(jnp.asarray(v)))
        agg = a if agg is None else jax.tree_util.tree_map(max, agg, a)
    if agg is None:
        raise ValueError("calibration needs at least one batch")
    return jax.tree_util.tree_map(
        lambda a: max(a, 1e-6) * margin / 127.0, agg)


# -------------------------------------------------------------- conversion


def _quant_w(w):
    sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0
    wi = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    return wi, sw.astype(jnp.float32)


def quantize(params, scales, *, channels=12, down_num=3) -> Dict:
    """Build the int8 inference tree from the trained flagship param tree
    and `calibrate()` scales. Layout mirrors the param tree one level down
    (block → st1/st2 → fused conv triple with pre-fused epilogues)."""
    levels = _levels(channels, down_num)
    packed_of: Dict[str, bool] = {}
    packed = False
    for i, (_, lp) in enumerate(levels):
        packed = lp
        for k in _block_keys(params, "down_blocks", i):
            packed_of[k] = packed
    c = levels[-1][0]
    for i in range(down_num):
        dst_c = c // 4
        packed = (dst_c < 256) and (i < down_num - 1)
        c = dst_c
        for k in _block_keys(params, "up_blocks", i):
            packed_of[k] = packed

    q: Dict[str, Dict] = {}
    for bk, bp in params.items():
        q[bk] = {}
        for stn in ("st1", "st2"):
            w0, b0, w1, b1, w2x, w2h, b2 = _prep(bp[stn], packed_of[bk])
            s_x, s_h0, s_h1 = scales[bk][stn]
            w0i, sw0 = _quant_w(w0)
            w1i, sw1 = _quant_w(w1)
            # one weight-scale vector across the full fused head
            w2i, sw2 = _quant_w(jnp.concatenate([w2x, w2h], axis=2))
            cx = w2x.shape[2]
            q[bk][stn] = {
                "s_x": np.float32(s_x), "s_h0": np.float32(s_h0),
                "s_h1": np.float32(s_h1),
                "w0": w0i, "m0": s_x * sw0, "b0": b0,
                "w1": w1i, "m1": s_h0 * sw1, "b1": b1,
                "w2x": w2i[:, :, :cx], "w2h": w2i[:, :, cx:],
                "m2x": s_x * sw2, "m2h": s_h1 * sw2, "b2": b2,
            }
    return q


# ---------------------------------------------------------------- int8 run


def forward_int8(q, x, *, channels=12, down_num=3, dtype=jnp.bfloat16):
    """Int8 packed-space embed forward. Learned convs accumulate
    int8×int8→int32 on the MXU; transitions/affines ride ``dtype`` exactly
    as the bf16 executor's; output is f32 (feeds ste_quantize_255)."""

    def qconv(zi, wi, pad):
        return lax.conv_general_dilated(
            zi, wi, (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    def st(c, name, xin, packed):
        p = c[name]
        xi = jnp.clip(jnp.round(xin.astype(jnp.float32) / p["s_x"]),
                      -127, 127).astype(jnp.int8)
        h0 = jax.nn.elu(qconv(xi, p["w0"], 1).astype(jnp.float32)
                        * p["m0"] + p["b0"])
        h0i = jnp.clip(jnp.round(h0 / p["s_h0"]), -127, 127).astype(jnp.int8)
        h1 = jax.nn.elu(qconv(h0i, p["w1"], 1).astype(jnp.float32)
                        * p["m1"] + p["b1"])
        h1i = jnp.clip(jnp.round(h1 / p["s_h1"]), -127, 127).astype(jnp.int8)
        out = (qconv(xi, p["w2x"], 0).astype(jnp.float32) * p["m2x"]
               + qconv(h1i, p["w2h"], 0).astype(jnp.float32) * p["m2h"]
               + p["b2"])
        half = out.shape[-1] // 2
        return out[..., :half], out[..., half:]

    return _walk(q, x, st, channels, down_num, dtype)
