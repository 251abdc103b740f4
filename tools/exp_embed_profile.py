"""Per-stage timing of the flagship embed path on TPU.

Times each coupling level at its true shape, the Haar chain, and layout
glue, to locate where the 33 ms (b32) embed budget actually goes.
Run: python tools/exp_embed_profile.py [--batch 32]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, *args, steps=10):
    """Times fn with a data DEPENDENCY between steps (x_{i+1} = f(.., x_i) —
    the fns here are shape-preserving): independent dispatches through the
    axon tunnel can overlap/elide, so only a serialized chain measures real
    per-step latency. Also reshapes output dtype back to the input's."""
    import jax
    f = jax.jit(fn)
    x = args[-1]
    o = f(*args[:-1], x)
    jax.block_until_ready(o)
    dt_in = x.dtype

    t0 = time.perf_counter()
    cur = x
    for _ in range(steps):
        cur = f(*args[:-1], cur).astype(dt_in).reshape(x.shape)
    jax.block_until_ready(cur)
    dt = (time.perf_counter() - t0) / steps
    print(f"{name:42s} {dt*1e3:8.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from vwfd_tpu.nets.inn import RNVPCoupling, InvertibleNet
    from vwfd_tpu.ops.haar import haar_downsample, haar_upsample
    from vwfd_tpu.ops.quantize import clamp_with_grad, ste_quantize_255

    b = args.batch
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # full INN fwd at bench shape
    inn = InvertibleNet(channels=12, dtype=jnp.bfloat16)
    x12 = jnp.asarray(rng.random((b, 256, 256, 12), np.float32))
    v = inn.init(key, x12)
    t_full = timed("INN fwd (12ch 256^2)", lambda p, x: inn.apply(p, x), v, x12)

    # Haar chain only
    def haars(x):
        x = x.astype(jnp.bfloat16)
        for _ in range(3):
            x = haar_downsample(x)
        for _ in range(3):
            x = haar_upsample(x)
        return x
    timed("haar x3 down + x3 up", haars, x12)

    # layout glue
    def glue(x):
        return ste_quantize_255(clamp_with_grad(x))
    timed("clamp+quantize", glue, x12)

    # per-level couplings at their true shapes (bf16 in/out)
    shapes = [  # (label, C, H)
        ("coupling 48ch @128^2 (down1)", 48, 128),
        ("coupling 192ch @64^2 (down2)", 192, 64),
        ("coupling 768ch @32^2 (down3)", 768, 32),
        ("coupling 192ch @64^2 (up1)", 192, 64),
        ("coupling 48ch @128^2 (up2)", 48, 128),
    ]
    total = 0.0
    for label, c, h in shapes:
        m = RNVPCoupling(channels=c, dtype=jnp.bfloat16)
        xx = jnp.asarray(rng.random((b, h, h, c), np.float32), jnp.bfloat16)
        p = m.init(key, xx)
        total += timed(label, lambda p, x, m=m: m.apply(p, x), p, xx)
    print(f"{'sum of couplings':42s} {total*1e3:8.2f} ms  "
          f"(INN full = {t_full*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
