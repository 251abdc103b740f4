"""XLA cost analysis (FLOPs / bytes) for each bench pipeline stage —
timing-free and therefore reliable through the axon tunnel."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subnet", default="res")
    ap.add_argument("--extractor", default="unet")
    ap.add_argument("--s2d", type=int, default=2)
    ap.add_argument("--efeatures", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from vwfd_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from vwfd_tpu.models import VideoWatermarkModel
    from vwfd_tpu.attacks import attack_pool_video

    cfg = Config(data=DataConfig(gt_size=256, frames=4, batch_size=32),
                 model=ModelConfig(inn_subnet=args.subnet,
                                   extractor=args.extractor,
                                   extractor_s2d=args.s2d,
                                   extractor_features=args.efeatures),
                 train=TrainConfig(dtype="bfloat16"))
    model = VideoWatermarkModel(cfg)
    states = model.init_states(jax.random.PRNGKey(0))
    video = jnp.zeros((32, 4, 256, 256, 3), jnp.float32)
    key = jax.random.PRNGKey(1)

    def report(name, fn, *args):
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        fl = ca.get("flops", float("nan"))
        by = ca.get("bytes accessed", float("nan"))
        print(f"{name:10s} flops={fl:.3e}  bytes={by:.3e}  "
              f"(roofline@197TF: {fl/197e12*1e3:.1f} ms, "
              f"@819GB/s: {by/819e9*1e3:.1f} ms)")

    report("embed", lambda v: model.embed(states, v), video)
    report("attack", lambda k, v: attack_pool_video(k, v), key, video)
    report("extract", lambda v: model.predict_mask(states, v, train=False),
           video)


if __name__ == "__main__":
    main()
