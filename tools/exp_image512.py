"""Production-scale check for the still-image family: one PAMI and one CLR
train step at the reference's 512² resolution (train_IRNclr_x4.yml:38-39,
batch 3) on the real chip — memory fit + step time + finite losses."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("tasks", nargs="*", default=["pami", "clr"])
    ap.add_argument("--subnet", default="res",
                    help="INN coupling subnet: res (reference-shaped, the "
                         "r2 measurement) | res_tpu | res_tpu2 (MXU-shaped)")
    ap.add_argument("--haar", default="lift",
                    help="INN Haar impl: lift | conv | mixed (ops/haar.py)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from vwfd_tpu.config import Config, DataConfig, ModelConfig
    from vwfd_tpu.models.image_model import ImageImmunizationModel, ImageBatch

    b, s = 3, 512
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((b, s, s, 3), np.float32))
    canny = jnp.asarray((rng.random((b, s, s, 1)) > 0.92).astype(np.float32))
    m = np.zeros((b, s, s, 1), np.float32)
    m[:, 128:320, 128:320] = 1.0
    batch = ImageBatch(img, canny, jnp.asarray(m))
    prev = jnp.clip(img + 0.03, 0, 1)

    for task in (args.tasks or ["pami", "clr"]):
        # reverse_k=3: full 6-way reverse is ~HBM-exact on one v5e at 512²
        # even with bf16 + remat; 3 reversed copies leave headroom (the
        # reference trains this on 24-48 GB GPUs)
        model = ImageImmunizationModel(
            Config(data=DataConfig(gt_size=s, batch_size=b),
                   model=ModelConfig(inn_subnet=args.subnet,
                                     inn_haar=args.haar)),
            task=task, reverse_k=3)
        states = model.init_states(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        states, logs = model.train_step(states, batch, prev, key)  # compile
        _ = float(logs["loss"])
        t0 = time.perf_counter()
        n = 5
        for i in range(n):
            key, k = jax.random.split(key)
            states, logs = model.train_step(states, batch, prev, k)
        loss = float(logs["loss"])  # sync via states chain
        dt = (time.perf_counter() - t0) / n
        print(f"{task}@512^2 b{b}: {dt*1e3:.0f} ms/step  loss={loss:.3f}  "
              f"PF={float(logs['PF']):.1f} dB")
        assert np.isfinite(loss)


if __name__ == "__main__":
    main()
