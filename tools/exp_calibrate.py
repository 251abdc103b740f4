"""Calibrate the axon TPU: time a known-FLOP matmul chain and print XLA's
cost analysis for the INN fwd, to sanity-check profile numbers."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    print("devices:", jax.devices(), "backend:", jax.default_backend())

    n = 8192
    a = jnp.asarray(np.random.default_rng(0).random((n, n), np.float32),
                    jnp.bfloat16)

    @jax.jit
    def mm(x):
        y = jnp.dot(x, x, preferred_element_type=jnp.float32)
        return (y * 1e-9).astype(jnp.bfloat16)

    x = mm(a)
    jax.block_until_ready(x)
    steps = 10
    t0 = time.perf_counter()
    cur = a
    for _ in range(steps):
        cur = mm(cur)
    jax.block_until_ready(cur)
    dt = (time.perf_counter() - t0) / steps
    fl = 2 * n ** 3
    print(f"matmul {n}^3 bf16: {dt*1e3:.2f} ms -> {fl/dt/1e12:.1f} TFLOP/s")

    # XLA cost analysis of the INN forward at bench shape
    from vwfd_tpu.nets.inn import InvertibleNet
    inn = InvertibleNet(channels=12, dtype=jnp.bfloat16)
    x12 = jnp.asarray(np.random.default_rng(1).random((32, 256, 256, 12),
                                                      np.float32))
    v = inn.init(jax.random.PRNGKey(0), x12)
    lowered = jax.jit(lambda p, x: inn.apply(p, x)).lower(v, x12)
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print("INN fwd cost_analysis flops: %.3e" % ca.get("flops", float("nan")))
    print("INN fwd bytes accessed: %.3e" % ca.get("bytes accessed",
                                                  float("nan")))

    # and a serialized timing with device_get sync (belt and braces)
    f = jax.jit(lambda p, x: inn.apply(p, x))
    o = f(v, x12)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    cur = x12
    for _ in range(steps):
        cur = f(v, cur)
    _ = np.asarray(cur)  # device_get forces a real sync + transfer
    dt = (time.perf_counter() - t0) / steps
    print(f"INN fwd chained (device_get sync): {dt*1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
