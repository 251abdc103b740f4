"""TPU benchmark: fused Pallas ResSubnet vs XLA conv chain at the embed
pipeline's real shapes. Timing = bench.py-style independent dispatch loop
with a small-output fetch for true sync."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from vwfd_tpu.nets.pallas_coupling import (
        fused_res_subnet, res_subnet_reference)

    rng = np.random.default_rng(0)
    import sys as _sys
    all_cases = [  # (label, B, H, Cin, F, Cout) — st-subnet shapes in the embed
        ("down1 st (48ch @128^2)", 32, 128, 24, 64, 48),
        ("down2 st (192ch @64^2)", 32, 64, 96, 64, 192),
        ("down3 st (768ch @32^2)", 32, 32, 384, 64, 768),
    ]
    sel = [int(a) for a in _sys.argv[1:]] or list(range(len(all_cases)))
    cases = [all_cases[i] for i in sel]
    for label, b, hw, cin, f, cout in cases:
        shapes = [(3, 3, cin, f), (3, 3, f, f), (3, 3, f, f), (3, 3, f, f),
                  (3, 3, cin + f, cout)]
        ws = tuple(jnp.asarray(rng.standard_normal(s).astype(np.float32) * .1)
                   for s in shapes)
        bs = tuple(jnp.asarray(rng.standard_normal(s[-1]).astype(np.float32))
                   for s in shapes)
        x = jnp.asarray(rng.standard_normal((b, hw, hw, cin)).astype(np.float32))

        def bench(fn, steps=10):
            g = jax.jit(lambda xx: jnp.mean(
                fn(xx, ws, bs).astype(jnp.float32)))
            o = g(x)
            _ = float(o)
            t0 = time.perf_counter()
            for i in range(steps):
                o = g(x + jnp.float32(i * 1e-6))
            _ = float(o)
            return (time.perf_counter() - t0) / steps

        t_xla = bench(res_subnet_reference)
        t_pls = bench(fused_res_subnet)
        import functools
        variants = {"pipe": functools.partial(fused_res_subnet,
                                              pipelined=True)}
        for th in (64, 128):
            if hw >= th:
                variants[f"pipe{th}"] = functools.partial(
                    fused_res_subnet, pipelined=True, tile=(th, min(th, hw)))
        t_var = {}
        for name, fn in variants.items():
            try:
                t_var[name] = bench(fn)
            except Exception as e:  # Mosaic rejections recorded, not fatal
                t_var[name] = None
                print(f"  {name} failed: {str(e).splitlines()[0][:120]}")
        # numeric check on hardware too
        d = float(jnp.max(jnp.abs(
            fused_res_subnet(x, ws, bs).astype(jnp.float32) -
            res_subnet_reference(x, ws, bs).astype(jnp.float32))))
        dp = float(jnp.max(jnp.abs(
            fused_res_subnet(x, ws, bs, pipelined=True).astype(jnp.float32) -
            res_subnet_reference(x, ws, bs).astype(jnp.float32))))
        extra = "  ".join(f"{n}={t*1e3:7.2f} ms" for n, t in t_var.items()
                          if t is not None)
        print(f"{label:26s} xla={t_xla*1e3:7.2f} ms  pallas={t_pls*1e3:7.2f} ms"
              f"  {extra}  speedup={t_xla/t_pls:5.2f}x  maxdiff={d:.3f}"
              f"  maxdiff_pipe={dp:.3f}")


if __name__ == "__main__":
    main()
