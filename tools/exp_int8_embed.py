"""In-context A/B: bf16 packed-executor embed stage vs the int8 PTQ path.

After the int8 extractor (tools/exp_int8_extract.py, 2.27× stage win), the
embed INN is the largest remaining bf16 stage (Sembed 9.2 ms at the packed
point, BASELINE.md r3). This probe runs the REAL flagship embed param tree
through `nets/inn_int8.py` — calibrate on the probe inputs, quantize, then
time the bf16 packed executor vs the int8 program scan-chunked with a
step-to-step data dependency (bench.py methodology; micro-benches through
the axon tunnel are untrustworthy — BASELINE.md r2 calibration).

Accuracy rides the real conversion path here (unlike the extract probe's
fixed-scale twin), so the printed max|Δ| is meaningful; the trained-
checkpoint quality gate lives in tools/exp_int8_eval.py --int8-embed.

Run: python tools/exp_int8_embed.py [--chunk 16] [--batch 32]
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
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax
    from vwfd_tpu.nets import InvertibleNet, inn_packed
    from vwfd_tpu.nets import inn_int8 as q8

    ch = 3 * args.frames
    n = args.batch
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((n, args.size, args.size, ch), np.float32))
    net = InvertibleNet(channels=ch, down_num=3, block_num=(1, 1, 1),
                        subnet="res_tpu2", fused_st=True,
                        dtype=jnp.bfloat16)
    v = net.init(jax.random.PRNGKey(0), x0)
    # zero-init heads make couplings identities — perturb so the affines and
    # activation ranges are exercised like a trained net's
    key = jax.random.PRNGKey(7)

    def perturb(path, a):
        nonlocal key
        if any(getattr(k, "key", "") == "Conv_2" for k in path):
            key, k2 = jax.random.split(key)
            return a + 0.05 * jax.random.normal(k2, a.shape, jnp.float32)
        return a

    p = jax.tree_util.tree_map_with_path(perturb, v["params"])

    scales = q8.calibrate(p, [x0], channels=ch)
    qp = q8.quantize(p, scales, channels=ch)

    def bf16_forward(x):
        return inn_packed.forward(p, x, channels=ch, down_num=3,
                                  dtype=jnp.bfloat16)

    def int8_forward(x):
        return q8.forward_int8(qp, x, channels=ch, down_num=3,
                               dtype=jnp.bfloat16)

    d = float(jnp.max(jnp.abs(jnp.clip(int8_forward(x0), 0, 1)
                              - jnp.clip(bf16_forward(x0), 0, 1))))
    print(f"max|Δ| (clipped embed output, int8 vs bf16): {d:.4f}")

    frames_per = n * args.frames

    def timed(name, fwd):
        @jax.jit
        def run(v0):
            def body(carry, _):
                y = jnp.clip(fwd(carry), 0.0, 1.0)
                return jnp.clip(0.9 * x0 + 0.1 * y, 0.0, 1.0), jnp.mean(y)
            return lax.scan(body, v0, None, length=args.chunk)[1]

        out = run(x0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = run(x0)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (args.steps * args.chunk)
        print(f"{name}: {dt*1e3:.2f} ms/step ({frames_per/dt:.0f} frames/s)")
        return dt

    t_bf = timed("bf16 embed (packed executor)", bf16_forward)
    t_i8 = timed("int8 embed (PTQ path)       ", int8_forward)
    print(f"speedup: {t_bf/t_i8:.2f}x")


if __name__ == "__main__":
    main()
