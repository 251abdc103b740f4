"""Training CLI — replaces the reference's `torch.distributed.launch train.py
-opt <yml>` entry (train.py:266-335). One process drives the whole mesh; the
task is selected by config (`task:`), mirroring the reference's `model:` /
`task_name:` switches (SURVEY.md §0).

Usage:
    python train.py --config vwfd_tpu/configs/video.yaml --steps 1000
    python train.py --task hidden --synthetic --steps 50
    python train.py --task video --val
"""

import argparse
import dataclasses

import numpy as np


def _video_loop(cfg, mesh, args, key):
    import jax
    from vwfd_tpu.data import DavisVideoDataset, SyntheticVideoDataset, Loader
    from vwfd_tpu.models import VideoWatermarkModel, VideoBatch
    from vwfd_tpu.models.state import restore_checkpoint, latest_step
    from vwfd_tpu.parallel import batch_sharding
    from vwfd_tpu.utils import Progbar, setup_logger

    logger = setup_logger("base")
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
    key, k0 = jax.random.split(key)
    states = model.init_states(k0)
    step0 = latest_step(cfg.ckpt_dir) if args.resume else None
    if step0 is not None:
        logger.info("resuming from step %d", step0)
        states = restore_checkpoint(cfg.ckpt_dir, step0, states)

    if args.val:
        import jax.numpy as jnp
        acc = []
        for i, (video, mask) in enumerate(loader):
            if i >= 10:
                break
            batch = VideoBatch(jnp.asarray(video), jnp.asarray(mask))
            key, k = jax.random.split(key)
            out = model.eval_step(states, batch, batch.video, k)
            acc.append({k2: float(v) for k2, v in out.items() if v.ndim == 0})
        logger.info("eval: %s", {k2: float(np.mean([m[k2] for m in acc]))
                                 for k2 in acc[0]})
        return

    steps = args.steps or cfg.train.niter
    pb = Progbar(steps, stateful_metrics=["PF"])
    states, logs = model.fit(loader, steps=steps, key=key, states=states,
                             progbar=pb, ckpt_dir=cfg.ckpt_dir)
    logger.info("done: %s", logs)


def _image_loop(cfg, mesh, args, key, task):
    import jax
    import jax.numpy as jnp
    import cv2
    from vwfd_tpu.data import SyntheticImageDataset, Loader
    from vwfd_tpu.data.masks import free_form_stroke_mask
    from vwfd_tpu.data.images import ImageFolderDataset
    from vwfd_tpu.models.image_model import ImageImmunizationModel, ImageBatch
    from vwfd_tpu.utils import Progbar, setup_logger

    logger = setup_logger("base")
    dcfg = cfg.data
    rng = np.random.default_rng(cfg.train.seed)

    class _Wrapped:
        """Image + host-side canny + stroke mask (LQGT_dataset.py:38-92)."""

        def __init__(self):
            if dcfg.synthetic or not dcfg.root:
                self.base = SyntheticImageDataset(size=dcfg.gt_size,
                                                  length=2000,
                                                  seed=cfg.train.seed)
            else:
                self.base = ImageFolderDataset(dcfg.root, size=dcfg.gt_size)

        def __len__(self):
            return len(self.base)

        def __getitem__(self, idx):
            item = self.base[idx]
            img = item["image"] if isinstance(item, dict) else item
            gray = cv2.cvtColor((img * 255).astype(np.uint8),
                                cv2.COLOR_RGB2GRAY)
            canny = (cv2.Canny(gray, 100, 200).astype(np.float32) / 255.0)
            mask = free_form_stroke_mask(rng, (dcfg.gt_size, dcfg.gt_size))
            return img, canny[..., None], mask[..., None]

    loader = Loader(_Wrapped(), dcfg.batch_size, seed=cfg.train.seed)
    model = ImageImmunizationModel(cfg, task=task,
                                   with_jpeg_simulator=args.jpeg_simulator)
    # real-libjpeg pairs for the simulator (IRN_model.py:735-760 recipe):
    # host-side PIL compression of the clean batch at a random drawn QF
    from vwfd_tpu.attacks.jpeg import jpeg_real
    key, k0 = jax.random.split(key)
    states = model.init_states(k0)
    steps = args.steps or cfg.train.niter
    pb = Progbar(steps, stateful_metrics=["PF", "PB"])
    prev = None
    step = 0
    while step < steps:
        for img, canny, mask in loader:
            if step >= steps:
                break
            batch = ImageBatch(jnp.asarray(img), jnp.asarray(canny),
                               jnp.asarray(mask))
            if prev is None:
                prev = batch.image
                continue
            key, k = jax.random.split(key)
            if args.jpeg_simulator:
                q = int(rng.choice([50, 60, 70, 80, 90]))
                pair = (jnp.asarray(jpeg_real(img, q)),
                        jnp.full((img.shape[0],), q / 100.0, jnp.float32))
                states, logs = model.train_step(states, batch, prev, k,
                                                jpeg_pair=pair)
            else:
                states, logs = model.train_step(states, batch, prev, k)
            prev = batch.image
            step += 1
            pb.add(1, values=[(k2, float(v)) for k2, v in logs.items()])
    logger.info("done")


def _message_loop(cfg, mesh, args, key, task):
    import jax
    import jax.numpy as jnp
    from vwfd_tpu.data import SyntheticImageDataset, Loader
    from vwfd_tpu.utils import Progbar, setup_logger

    logger = setup_logger("base")
    dcfg = cfg.data
    if task == "hidden":
        from vwfd_tpu.models.hidden_model import HiddenModel
        model = HiddenModel(image_size=dcfg.gt_size)
    else:
        from vwfd_tpu.models.mbrs_model import MBRSModel
        model = MBRSModel(image_size=dcfg.gt_size)
    key, k0 = jax.random.split(key)
    states = model.init_states(k0)
    loader = Loader(SyntheticImageDataset(size=dcfg.gt_size, length=2000,
                                          seed=cfg.train.seed),
                    dcfg.batch_size, seed=cfg.train.seed)
    steps = args.steps or cfg.train.niter
    pb = Progbar(steps, stateful_metrics=["bitwise_error"])
    rng = np.random.default_rng(cfg.train.seed)
    step = 0
    while step < steps:
        for imgs in loader:
            if step >= steps:
                break
            msgs = jnp.asarray(
                (rng.random((imgs.shape[0], model.message_length)) > 0.5)
                .astype(np.float32))
            key, k = jax.random.split(key)
            states, logs = model.train_step(states, jnp.asarray(imgs), msgs, k)
            step += 1
            pb.add(1, values=[(k2, float(v)) for k2, v in logs.items()])
    logger.info("done")


def _kdjpeg_loop(cfg, mesh, args, key):
    import jax
    import jax.numpy as jnp
    from vwfd_tpu.data.jpeg_data import LQJpegDataset
    from vwfd_tpu.data import Loader
    from vwfd_tpu.models.kdjpeg_model import KDJpegModel
    from vwfd_tpu.utils import Progbar, setup_logger

    logger = setup_logger("base")
    dcfg = cfg.data
    ds = LQJpegDataset(root=None if dcfg.synthetic else dcfg.root,
                       size=dcfg.gt_size, synthetic_length=2000,
                       seed=cfg.train.seed)
    loader = Loader(ds, max(1, dcfg.batch_size // 6), seed=cfg.train.seed)
    model = KDJpegModel(cfg, qf_classes=6, size=dcfg.gt_size)
    key, k0 = jax.random.split(key)
    states = model.init_states(k0)
    steps = args.steps or cfg.train.niter
    pb = Progbar(steps, stateful_metrics=["PSSIMU"])
    step = 0
    while step < steps:
        for versions, labels in loader:
            if step >= steps:
                break
            flat, lab = KDJpegModel.collate(versions, labels, qf_classes=6)
            key, k = jax.random.split(key)
            states, logs = model.train_step(states, jnp.asarray(flat),
                                            jnp.asarray(lab), k)
            step += 1
            pb.add(1, values=[(k2, float(v)) for k2, v in logs.items()])
    logger.info("done")


def _tianchi_loop(cfg, mesh, args, key):
    import jax
    import jax.numpy as jnp
    from vwfd_tpu.data import SyntheticVideoDataset, Loader
    from vwfd_tpu.models.tianchi_model import TianchiModel
    from vwfd_tpu.utils import Progbar, setup_logger

    logger = setup_logger("base")
    dcfg = cfg.data
    ds = SyntheticVideoDataset(size=dcfg.gt_size, frames=1, length=2000,
                               seed=cfg.train.seed)
    loader = Loader(ds, dcfg.batch_size, seed=cfg.train.seed)
    model = TianchiModel(cfg)
    key, k0 = jax.random.split(key)
    states = model.init_states(k0)
    steps = args.steps or cfg.train.niter
    pb = Progbar(steps)
    step = 0
    while step < steps:
        for video, mask in loader:
            if step >= steps:
                break
            key, k = jax.random.split(key)
            states, logs = model.train_step(states, jnp.asarray(video[:, 0]),
                                            jnp.asarray(mask[:, 0]), k)
            step += 1
            pb.add(1, values=[(k2, float(v)) for k2, v in logs.items()])
    logger.info("done")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default=None, help="YAML config path")
    ap.add_argument("--task", type=str, default=None,
                    help="video | pami | clr | imuge | hidden | mbrs | "
                         "kdjpeg | tianchi")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--val", action="store_true", help="run evaluation")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--jpeg-simulator", dest="jpeg_simulator",
                    action="store_true",
                    help="co-train the FBCNN JPEG simulator against real "
                         "libjpeg pairs (IRN_model.py:735-760)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from vwfd_tpu.config import load_config
    from vwfd_tpu.parallel import make_mesh
    from vwfd_tpu.utils import setup_logger

    logger = setup_logger("base")
    cfg = load_config(args.config)
    if args.task:
        cfg = dataclasses.replace(cfg, task=args.task)
    if args.synthetic:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, synthetic=True))

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    logger.info("devices: %s (mesh=%s) task=%s", jax.devices(), mesh, cfg.task)

    key = jax.random.PRNGKey(cfg.train.seed)
    if cfg.task == "video":
        _video_loop(cfg, mesh, args, key)
    elif cfg.task in ("pami", "clr", "imuge", "image"):
        _image_loop(cfg, mesh, args, key,
                    "pami" if cfg.task == "image" else cfg.task)
    elif cfg.task in ("hidden", "mbrs"):
        _message_loop(cfg, mesh, args, key, cfg.task)
    elif cfg.task == "kdjpeg":
        _kdjpeg_loop(cfg, mesh, args, key)
    elif cfg.task == "tianchi":
        _tianchi_loop(cfg, mesh, args, key)
    else:
        raise SystemExit(f"unknown task {cfg.task!r}")


if __name__ == "__main__":
    main()
