"""Training CLI — replaces the reference's `torch.distributed.launch train.py
-opt <yml>` entry (train.py:266-335). One process drives the whole mesh.

Usage:
    python train.py --config vwfd_tpu/configs/video.yaml --steps 1000
    python train.py --synthetic --steps 50          # no dataset needed
    python train.py --val                           # evaluation pass
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default=None, help="YAML config path")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--val", action="store_true", help="run evaluation")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    import jax
    from vwfd_tpu.config import load_config
    from vwfd_tpu.data import DavisVideoDataset, SyntheticVideoDataset, Loader
    from vwfd_tpu.models import VideoWatermarkModel, VideoBatch
    from vwfd_tpu.models.state import restore_checkpoint, latest_step
    from vwfd_tpu.parallel import make_mesh, batch_sharding
    from vwfd_tpu.utils import Progbar, setup_logger

    logger = setup_logger("base")
    cfg = load_config(args.config)
    if args.synthetic:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, synthetic=True))

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    logger.info("devices: %s (mesh=%s)", jax.devices(), mesh)

    dcfg = cfg.data
    if dcfg.synthetic or not dcfg.root:
        dataset = SyntheticVideoDataset(size=dcfg.gt_size, frames=dcfg.frames,
                                        length=2000, seed=cfg.train.seed)
    else:
        dataset = DavisVideoDataset(dcfg.root, size=dcfg.gt_size,
                                    frames=dcfg.frames,
                                    mask_rate_max=dcfg.mask_rate_max,
                                    seed=cfg.train.seed)
    sharding = batch_sharding(mesh) if mesh is not None else None
    loader = Loader(dataset, dcfg.batch_size, seed=cfg.train.seed,
                    sharding=sharding)

    model = VideoWatermarkModel(cfg, mesh=mesh)
    key = jax.random.PRNGKey(cfg.train.seed)
    key, k0 = jax.random.split(key)
    states = model.init_states(k0)

    step0 = latest_step(cfg.ckpt_dir) if args.resume else None
    if step0 is not None:
        logger.info("resuming from step %d", step0)
        states = restore_checkpoint(cfg.ckpt_dir, step0, states)

    if args.val:
        import jax.numpy as jnp
        metrics_acc = []
        for i, (video, mask) in enumerate(loader):
            if i >= 10:
                break
            batch = VideoBatch(jnp.asarray(video), jnp.asarray(mask))
            key, k = jax.random.split(key)
            out = model.eval_step(states, batch, batch.video, k)
            metrics_acc.append({k2: float(v) for k2, v in out.items()
                                if v.ndim == 0})
        agg = {k2: float(np.mean([m[k2] for m in metrics_acc]))
               for k2 in metrics_acc[0]}
        logger.info("eval: %s", agg)
        return

    steps = args.steps or cfg.train.niter
    pb = Progbar(steps, stateful_metrics=["PF"])
    states, logs = model.fit(loader, steps=steps, key=key, states=states,
                             progbar=pb, ckpt_dir=cfg.ckpt_dir)
    logger.info("done: %s", logs)


if __name__ == "__main__":
    main()
