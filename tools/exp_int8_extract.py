"""In-context A/B: bf16 UNetTPU extract stage vs an int8 PTQ twin.

The packed-point profile (BASELINE.md r3) puts the extract stage at 15.6 ms
per 128-frame step — ~1.3× its bf16 compute roof, now the pipeline
bottleneck. The v5e MXU runs int8 at ~2× the bf16 rate (measured 290 TOP/s
vs 160 TF/s on 8k³ dots through this tunnel), so an int8 inference path has
~2× stage headroom IF XLA lowers int8 convs onto the MXU's int8 mode.

This probe walks the REAL flagship UNetTPU param tree, folds BatchNorm
(inference affine) into each conv, quantizes weights per-output-channel and
activations per-tensor (static scales; requant fused as one
multiply-round-clip epilogue, ReLU folded into the clip's lower bound), and
times the full forward scan-chunked with a step-to-step data dependency —
the same methodology as bench.py (micro-benches through the axon tunnel are
untrustworthy; BASELINE.md r2 calibration).

Accuracy is NOT the point here (scales are crude); this measures the stage
throughput ceiling of an int8 serving path.

Run: python tools/exp_int8_extract.py [--chunk 16] [--batch 32]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--econvs", type=str, default="2,2,1,1,1")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax
    from vwfd_tpu.nets.unet import UNetTPU

    econvs = tuple(int(s) for s in args.econvs.split(","))
    net = UNetTPU(init_features=64, s2d=2, dtype=jnp.bfloat16,
                  enc_convs=econvs, apply_sigmoid=True)
    n = args.batch * args.frames
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((n, args.size, args.size, 3), np.float32))
    variables = net.init(jax.random.PRNGKey(0), x0, train=False)
    params, stats = variables["params"], variables["batch_stats"]

    # ---------------- int8 twin ----------------
    EPS = 1e-5

    def fold_conv(level, i, kind="Conv"):
        """Fold BN_i into Conv_i of `level`; return (w_i8, sw, bias)."""
        k = params[level][f"{kind}_{i}"]["kernel"]
        bn = params[level][f"BatchNorm_{i}"]
        st = stats[level][f"BatchNorm_{i}"]
        g = bn["scale"] / jnp.sqrt(st["var"] + EPS)
        w = k * g[None, None, None, :]
        b = bn["bias"] - st["mean"] * g
        sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0
        wi = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
        return wi, sw, b

    def fold_named(name):  # decN_conv + decN_bn
        k = params[f"{name}_conv"]["kernel"]
        bn = params[f"{name}_bn"]
        st = stats[f"{name}_bn"]
        g = bn["scale"] / jnp.sqrt(st["var"] + EPS)
        w = k * g[None, None, None, :]
        b = bn["bias"] - st["mean"] * g
        sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0
        wi = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
        return wi, sw, b

    def quant_plain(k):
        sw = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)), 1e-8) / 127.0
        wi = jnp.clip(jnp.round(k / sw), -127, 127).astype(jnp.int8)
        return wi, sw

    # static activation scale for every layer (probe: fixed; a real PTQ path
    # calibrates these per layer)
    SA = 0.05  # activations quantized as round(x / SA)

    DN = ("NHWC", "HWIO", "NHWC")

    def qconv(xi, wi, stride=1):
        return lax.conv_general_dilated(
            xi, wi, (stride, stride), "SAME", dimension_numbers=DN,
            preferred_element_type=jnp.int32)

    def requant(acc_i32, sx, sw, bias):
        # y = relu(acc*sx*sw + bias) requantized to int8 at scale SA;
        # relu folds into the clip lower bound
        y = acc_i32.astype(jnp.float32) * (sx * sw)[None, None, None, :]
        y = (y + bias) * (1.0 / SA)
        return jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)

    # precompute folded weights once (host side of the jit boundary)
    enc_names = ["enc1", "enc2", "enc3", "enc4", "bottleneck"]
    ENC = [[fold_conv(nm, i) for i in range(econvs[j])]
           for j, nm in enumerate(enc_names)]
    DEC = {nm: fold_named(nm) for nm in ["dec4", "dec3", "dec2", "dec1"]}
    UPS = {nm: (quant_plain(params[nm]["kernel"]), params[nm]["bias"])
           for nm in ["up4", "up3", "up2", "up1"]}
    HW, HB = quant_plain(params["head"]["kernel"]), params["head"]["bias"]

    def int8_forward(x):
        b, h, w, c = x.shape
        # input in [0,1]: quantize at 1/127; then s2d stem as pure reshape
        xi = jnp.clip(jnp.round(x * 127.0), 0, 127).astype(jnp.int8)
        sx_in = 1.0 / 127.0
        s = 2
        xi = xi.reshape(b, h // s, s, w // s, s, c)
        xi = xi.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // s, w // s,
                                                    s * s * c)
        acts = []
        z, sz = xi, sx_in
        for j, level in enumerate(ENC):
            if j > 0:
                z = lax.reduce_window(z, jnp.int8(-128), lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
            for (wi, sw, bias) in level:
                z = requant(qconv(z, wi), sz, sw, bias)
                sz = SA
            if j < 4:
                acts.append((z, sz))

        # decoder: upsample (int8 conv_transpose) + split concat conv
        for lev, nm, up_nm in [(3, "dec4", "up4"), (2, "dec3", "up3"),
                               (1, "dec2", "up2"), (0, "dec1", "up1")]:
            (uwi, usw), ubias = UPS[up_nm]
            # flax ConvTranspose == lax.conv_transpose with the unflipped
            # kernel; int32 accumulate
            u = lax.conv_transpose(z, uwi, (2, 2), "SAME",
                                   dimension_numbers=DN,
                                   preferred_element_type=jnp.int32)
            uf = u.astype(jnp.float32) * (sz * usw)[None, None, None, :] + ubias
            ui = jnp.clip(jnp.round(uf / SA), -127, 127).astype(jnp.int8)
            skip, s_skip = acts[lev]
            wi, sw, bias = DEC[nm]
            cu = ui.shape[-1]
            ya = qconv(ui, wi[:, :, :cu])
            yb = qconv(skip, wi[:, :, cu:])
            y = (ya.astype(jnp.float32) * (SA * sw)
                 + yb.astype(jnp.float32) * (s_skip * sw) + bias)
            z = jnp.clip(jnp.round(y / SA), 0, 127).astype(jnp.int8)
            sz = SA

        # head 1×1 + depth-to-space + sigmoid (f32 epilogue)
        hwi, hsw = HW
        o = qconv(z, hwi).astype(jnp.float32) * (sz * hsw) + HB
        b2, hh, ww, cc = o.shape
        o = o.reshape(b2, hh, ww, 2, 2, cc // 4)
        o = o.transpose(0, 1, 3, 2, 4, 5).reshape(b2, hh * 2, ww * 2, cc // 4)
        return jax.nn.sigmoid(o)

    def bf16_forward(x):
        return net.apply(variables, x, train=False)

    def timed(name, fwd):
        @jax.jit
        def run(v):
            def body(carry, _):
                m = fwd(carry)
                v_next = jnp.clip(0.9 * x0 + 0.1 * jnp.tile(m, (1, 1, 1, 3)),
                                  0.0, 1.0)
                return v_next, jnp.mean(m)
            return lax.scan(body, v, None, length=args.chunk)[1]

        out = run(x0)
        jax.block_until_ready(out)
        _ = np.asarray(out[0])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = run(x0)
        jax.block_until_ready(out)
        _ = np.asarray(out[0])
        dt = (time.perf_counter() - t0) / (args.steps * args.chunk)
        print(f"{name}: {dt*1e3:.2f} ms/step ({n/dt:.0f} frames/s)")
        return dt

    t_bf = timed("bf16 extract (real module)", bf16_forward)
    t_i8 = timed("int8 extract (PTQ twin) ", int8_forward)
    print(f"speedup: {t_bf/t_i8:.2f}x")


if __name__ == "__main__":
    main()
