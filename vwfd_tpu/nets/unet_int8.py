"""Int8 post-training-quantization serving path for `UNetTPU`.

The packed-point pipeline profile (BASELINE.md r3) leaves the tamper-mask
extractor as the bottleneck stage, running near its *bf16* compute roof —
but the v5e MXU executes int8 at ~2× the bf16 rate (measured 290 TOP/s vs
160 TF/s through this tunnel), so the remaining 2× is a numerics decision,
not a scheduling one. This module converts a trained `UNetTPU` to an int8
inference program:

  * **BatchNorm folding** — eval-mode BN is an affine map per channel; it
    folds into the preceding conv's kernel and a bias
    (w' = w·γ/√(σ²+ε), b' = β − μ·γ/√(σ²+ε)), bit-equivalent in f32.
  * **Per-output-channel symmetric int8 weights** (scale = amax/127) — the
    standard PTQ weight scheme; the per-channel scale vector rides the conv
    epilogue for free.
  * **Calibrated per-tensor activation scales** — `calibrate()` runs the
    folded-f32 net over representative batches and records each quant
    point's amax. ReLU outputs quantize unsigned-in-int8 ([0,127]); the
    decoder-upsample outputs (no ReLU) quantize signed ([−127,127]).
  * **Fused requant epilogues** — every layer's rescale+bias+ReLU+requant
    collapses at conversion time into one per-channel multiply-add +
    round + clip on the int32 accumulator (`m = s_in·s_w/s_out`,
    `b = bias/s_out`; the ReLU *is* the clip's lower bound).
  * **Concat-free decoder** — `conv(concat([up, skip]))` evaluates as
    `conv(up, K[:, :, :cu]) + conv(skip, K[:, :, cu:])` so the two operands
    keep their own activation scales (exact, kernel-sliced — the `split`
    lowering of nets/unet.py).

Scope: the flagship extractor options (head `d2s`, upsample `convt`,
decoder `concat`/`split`, any `enc_convs` plan, any `s2d`/`init_features`).
Training stays bf16; this is an inference/serving artifact, selected by
`WatermarkServer(int8_extract=True)` or `bench.py --int8-extract`, and
quality-gated by the measured F1 delta vs the bf16 net (BASELINE.md r3).

Reference context: the torch repo serves the UNet (network/UNet.py:7-98)
in fp32/AMP inside its trainers; it has no quantized inference path.
"""

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["fold_unet_tpu", "apply_folded", "calibrate", "quantize",
           "apply_int8"]

_EPS = 1e-5  # flax BatchNorm default epsilon
_DN = ("NHWC", "HWIO", "NHWC")
_ENC_NAMES = ("enc1", "enc2", "enc3", "enc4", "bottleneck")
_DEC_NAMES = ("dec4", "dec3", "dec2", "dec1")
_UP_NAMES = ("up4", "up3", "up2", "up1")


def _enc_plan(enc_convs) -> Tuple[int, ...]:
    if isinstance(enc_convs, int):
        return (enc_convs,) * 5
    plan = tuple(enc_convs)
    assert len(plan) == 5, "enc_convs plan is (enc1..enc4, bottleneck)"
    return plan


def _fold_bn(kernel, bn_params, bn_stats):
    g = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + _EPS)
    w = kernel * g[None, None, None, :]
    b = bn_params["bias"] - bn_stats["mean"] * g
    return w.astype(jnp.float32), b.astype(jnp.float32)


def fold_unet_tpu(variables, enc_convs=(2, 2, 1, 1, 1)) -> Dict:
    """Fold eval-mode BatchNorm into every conv of a `UNetTPU` param tree.

    Returns a pytree of f32 `(kernel, bias)` pairs in forward order:
    ``{"enc": [[(w, b), ...] ×5], "up": [(k, b) ×4], "dec": [(w, b) ×4],
    "head": (k, b)}`` — `apply_folded` on it is numerically the module's
    eval-mode forward (tested to f32 tolerance).
    """
    params, stats = variables["params"], variables["batch_stats"]
    plan = _enc_plan(enc_convs)
    enc = [
        [_fold_bn(params[name][f"Conv_{i}"]["kernel"],
                  params[name][f"BatchNorm_{i}"],
                  stats[name][f"BatchNorm_{i}"]) for i in range(plan[j])]
        for j, name in enumerate(_ENC_NAMES)
    ]
    ups = [(params[n]["kernel"].astype(jnp.float32),
            params[n]["bias"].astype(jnp.float32)) for n in _UP_NAMES]
    dec = [_fold_bn(params[f"{n}_conv"]["kernel"], params[f"{n}_bn"],
                    stats[f"{n}_bn"]) for n in _DEC_NAMES]
    head = (params["head"]["kernel"].astype(jnp.float32),
            params["head"]["bias"].astype(jnp.float32))
    return {"enc": enc, "up": ups, "dec": dec, "head": head}


def _s2d(x, s):
    b, h, w, c = x.shape
    x = x.reshape(b, h // s, s, w // s, s, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // s, w // s, s * s * c)


def _d2s(x, s, cout):
    b, h, w, _ = x.shape
    x = x.reshape(b, h, w, s, s, cout)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * s, w * s, cout)


def apply_folded(folded, x, s2d: int = 2, out_channels: int = 1,
                 apply_sigmoid: bool = True, collect_amax: bool = False):
    """Eval-mode `UNetTPU` forward on the BN-folded f32 tree.

    With ``collect_amax`` also returns the per-quant-point absolute maxima
    (the calibration observable): ``{"enc": [[a]×convs]×5, "up": [a]×4,
    "dec": [a]×4}``. The input point is not calibrated — serving inputs are
    [0,1] by contract (scale fixed at 1/127).
    """
    amax = {"enc": [], "up": [], "dec": []}

    def conv(z, w):
        return lax.conv_general_dilated(z, w, (1, 1), "SAME",
                                        dimension_numbers=_DN)

    z = _s2d(x.astype(jnp.float32), s2d)
    skips = []
    for j, level in enumerate(folded["enc"]):
        if j > 0:
            z = lax.reduce_window(z, -jnp.inf, lax.max, (1, 2, 2, 1),
                                  (1, 2, 2, 1), "VALID")
        lv = []
        for (w, b) in level:
            z = jax.nn.relu(conv(z, w) + b)
            lv.append(jnp.max(jnp.abs(z)))
        amax["enc"].append(lv)
        if j < 4:
            skips.append(z)

    for i, (name, (uk, ub), (dw, db)) in enumerate(
            zip(_DEC_NAMES, folded["up"], folded["dec"])):
        u = lax.conv_transpose(z, uk, (2, 2), "SAME",
                               dimension_numbers=_DN) + ub
        amax["up"].append(jnp.max(jnp.abs(u)))
        skip = skips[3 - i]
        cu = u.shape[-1]
        z = jax.nn.relu(conv(u, dw[:, :, :cu]) + conv(skip, dw[:, :, cu:])
                        + db)
        amax["dec"].append(jnp.max(jnp.abs(z)))

    hk, hb = folded["head"]
    o = conv(z, hk) + hb
    o = _d2s(o, s2d, out_channels)
    out = jax.nn.sigmoid(o) if apply_sigmoid else o
    return (out, amax) if collect_amax else out


def calibrate(variables, batches, enc_convs=(2, 2, 1, 1, 1), s2d: int = 2,
              out_channels: int = 1, margin: float = 1.0) -> Dict:
    """Per-tensor activation scales from representative inputs.

    ``batches`` is an iterable of (N, H, W, 3) arrays in [0,1] — serving
    traffic analogs (e.g. attacked watermarked frames). Scales are
    ``margin · max-over-batches(amax) / 127``.
    """
    folded = fold_unet_tpu(variables, enc_convs)
    run = jax.jit(lambda v: apply_folded(folded, v, s2d, out_channels,
                                         collect_amax=True)[1])
    agg = None
    for v in batches:
        a = jax.tree_util.tree_map(float, run(jnp.asarray(v)))
        agg = a if agg is None else jax.tree_util.tree_map(max, agg, a)
    if agg is None:
        raise ValueError("calibration needs at least one batch")
    return jax.tree_util.tree_map(
        lambda a: max(a, 1e-6) * margin / 127.0, agg)


def _quant_w(w) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8 weights; returns (w_i8, scale[c])."""
    sw = jnp.maximum(jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1))),
                     1e-8) / 127.0
    wi = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    return wi, sw.astype(jnp.float32)


def quantize(variables, scales, enc_convs=(2, 2, 1, 1, 1)) -> Dict:
    """Build the int8 inference tree from a trained `UNetTPU` param tree and
    `calibrate()` scales. Every requant epilogue is pre-fused: each conv
    carries ``m = s_in·s_w/s_out`` (per channel) and ``b = bias/s_out``; the
    head keeps its output in f32 logits (``s_out = 1``)."""
    folded = fold_unet_tpu(variables, enc_convs)
    s_in = 1.0 / 127.0  # serving contract: input in [0,1]
    qp = {"enc": [], "dec": []}
    sz = s_in
    for j, level in enumerate(folded["enc"]):
        lv = []
        for i, (w, b) in enumerate(level):
            wi, sw = _quant_w(w)
            s_out = scales["enc"][j][i]
            lv.append({"w": wi, "m": (sz * sw / s_out),
                       "b": (b / s_out)})
            sz = s_out
        qp["enc"].append(lv)
        # note: maxpool commutes with the (monotone, positive-scale) quant
    # encoder output scales per level, for the skip connections
    enc_out_scale = [scales["enc"][j][-1] for j in range(5)]

    sz = enc_out_scale[4]
    for i, (name, (uk, ub), (dw, db)) in enumerate(
            zip(_DEC_NAMES, folded["up"], folded["dec"])):
        uwi, usw = _quant_w(uk)
        s_up = scales["up"][i]
        cu = uk.shape[-1]
        cwi_u, csw = _quant_w(dw)  # one scale vector for the whole kernel
        s_skip = enc_out_scale[3 - i]
        s_out = scales["dec"][i]
        qp["dec"].append({
            "up_w": uwi, "up_m": (sz * usw / s_up), "up_b": (ub / s_up),
            "w_up": cwi_u[:, :, :cu], "w_skip": cwi_u[:, :, cu:],
            "m_up": (s_up * csw / s_out), "m_skip": (s_skip * csw / s_out),
            "b": (db / s_out),
        })
        sz = s_out

    hk, hb = folded["head"]
    hwi, hsw = _quant_w(hk)
    qp["head"] = {"w": hwi, "m": (sz * hsw), "b": hb}
    return qp


def apply_int8(qp, x, s2d: int = 2, out_channels: int = 1,
               apply_sigmoid: bool = True):
    """Int8 eval-mode `UNetTPU` forward. ``x`` is f32 in [0,1]; all convs
    accumulate int8×int8→int32 on the MXU's int8 path; epilogues are one
    fused multiply-add-round-clip each; output is f32 (probs or logits)."""

    def qconv(zi, wi):
        return lax.conv_general_dilated(zi, wi, (1, 1), "SAME",
                                        dimension_numbers=_DN,
                                        preferred_element_type=jnp.int32)

    def requant(acc, m, b, lo):
        y = acc.astype(jnp.float32) * m[None, None, None, :] + b
        return jnp.clip(jnp.round(y), lo, 127).astype(jnp.int8)

    zi = jnp.clip(jnp.round(x * 127.0), 0, 127).astype(jnp.int8)
    zi = _s2d(zi, s2d)
    skips = []
    for j, level in enumerate(qp["enc"]):
        if j > 0:
            zi = lax.reduce_window(zi, jnp.int8(-128), lax.max,
                                   (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        for c in level:
            zi = requant(qconv(zi, c["w"]), c["m"], c["b"], 0)
        if j < 4:
            skips.append(zi)

    for i, d in enumerate(qp["dec"]):
        u = lax.conv_transpose(zi, d["up_w"], (2, 2), "SAME",
                               dimension_numbers=_DN,
                               preferred_element_type=jnp.int32)
        ui = requant(u, d["up_m"], d["up_b"], -127)
        ya = qconv(ui, d["w_up"]).astype(jnp.float32)
        yb = qconv(skips[3 - i], d["w_skip"]).astype(jnp.float32)
        y = (ya * d["m_up"][None, None, None, :]
             + yb * d["m_skip"][None, None, None, :] + d["b"])
        zi = jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)

    h = qp["head"]
    o = qconv(zi, h["w"]).astype(jnp.float32) * h["m"][None, None, None, :] \
        + h["b"]
    o = _d2s(o, s2d, out_channels)
    return jax.nn.sigmoid(o) if apply_sigmoid else o
