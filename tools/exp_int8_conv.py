"""A/B: bf16 vs int8 conv throughput on TPU at UNetTPU extractor shapes.

v5e peaks: ~197 bf16 TFLOP/s vs ~394 int8 TOP/s. If XLA:TPU lowers
int8 convs (int8 lhs/rhs -> int32 accum) onto the MXU, the extract stage
(compute-bound at ~1.3x its bf16 roof) can nearly halve.

Run: python tools/exp_int8_conv.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    # true sync: host fetch (see BASELINE.md r2 tunnel caveats)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def conv(x, w, dtype=None):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype)


def main():
    key = jax.random.PRNGKey(0)
    # extractor-ish shapes: batch 128 frames (b32 clips x 4), 128^2 x 64ch
    # (enc1), 64^2 x 128 (enc2), 32^2 x 256 (enc3)
    shapes = [
        (128, 128, 128, 64, 64),
        (128, 64, 64, 128, 128),
        (128, 32, 32, 256, 256),
    ]
    for (n, h, w_, ci, co) in shapes:
        x = jax.random.normal(key, (n, h, w_, ci))
        w = jax.random.normal(key, (3, 3, ci, co)) * 0.05
        xb, wb = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
        xi = jnp.clip(jnp.round(x * 16), -127, 127).astype(jnp.int8)
        wi = jnp.clip(jnp.round(w * 512), -127, 127).astype(jnp.int8)

        f_bf16 = jax.jit(lambda a, b: conv(a, b))
        f_int8 = jax.jit(lambda a, b: conv(a, b, jnp.int32))

        t_bf = bench(f_bf16, xb, wb)
        try:
            t_i8 = bench(f_int8, xi, wi)
        except Exception as e:  # noqa: BLE001
            t_i8 = float("nan")
            print("int8 failed:", repr(e)[:200])
        flops = 2 * n * h * w_ * 9 * ci * co
        print(f"NHWC ({n},{h},{w_},{ci})->{co}: bf16 {t_bf:.3f} ms "
              f"({flops/t_bf/1e9:.0f} GF/s)  int8 {t_i8:.3f} ms "
              f"({flops/t_i8/1e9:.0f} GOP/s)")


if __name__ == "__main__":
    main()
