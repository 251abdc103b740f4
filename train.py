"""Training CLI — replaces the reference's `torch.distributed.launch train.py
-opt <yml>` entry (train.py:266-335). One process drives the whole mesh; the
task is selected by config (`task:`), mirroring the reference's `model:` /
`task_name:` switches (SURVEY.md §0). Multi-host pods set VWFD_MULTIHOST=1
(vwfd_tpu/parallel.maybe_init_distributed) — the SPMD analog of the
reference's per-GPU NCCL spawn (train.py:20-33).

Usage:
    python train.py --config vwfd_tpu/configs/video.yaml --steps 1000
    python train.py --task hidden --synthetic --steps 50
    python train.py --task video --val
"""

import argparse
import dataclasses
import os

import numpy as np


def _telemetry(cfg, args, is_main):
    """ScalarLogger + montage dir — the reference's SummaryWriter('runs/…')
    and stitch_images dumps (IRNcrop_model.py:78,399-400,421-437); process-0
    only (rank<=0 guard, train.py:96-109)."""
    if not is_main or args.no_telemetry:
        return None, None
    from vwfd_tpu.utils import ScalarLogger
    logdir = args.logdir or os.path.join("runs", f"{cfg.name}_{cfg.task}")
    montage_dir = os.path.join(cfg.out_dir, "montage")
    return ScalarLogger(logdir), montage_dir


def _loader_sharding(mesh):
    if mesh is None:
        return None
    from vwfd_tpu.parallel import batch_sharding
    return batch_sharding(mesh)


def _video_loop(cfg, mesh, args, key, is_main):
    import jax
    from vwfd_tpu.data import DavisVideoDataset, SyntheticVideoDataset, Loader
    from vwfd_tpu.models import VideoWatermarkModel, VideoBatch
    from vwfd_tpu.models.state import restore_checkpoint, latest_step
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
    loader = Loader(dataset, dcfg.batch_size, seed=cfg.train.seed,
                    sharding=_loader_sharding(mesh), ratio=dcfg.ratio)
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
        # splice source = the *previous* batch's clean clips, matching both
        # training and the reference's previous_images ring buffer
        # (models/IRNcrop_model.py:348,445-450) — using the current batch
        # would make "tampered" pixels self-referential at eval
        prev = None
        for i, (video, mask) in enumerate(loader):
            if i >= args.val_batches + 1:
                break
            batch = VideoBatch(jnp.asarray(video), jnp.asarray(mask))
            if prev is None:
                prev = batch.video
                continue
            key, k = jax.random.split(key)
            out = model.eval_step(states, batch, prev, k)
            acc.append({k2: float(v) for k2, v in out.items() if v.ndim == 0})
            prev = batch.video
        logger.info("eval: %s", {k2: float(np.mean([m[k2] for m in acc]))
                                 for k2 in acc[0]})
        return

    scalar_logger, montage_dir = _telemetry(cfg, args, is_main)
    steps = args.steps or cfg.train.niter
    pb = Progbar(steps, stateful_metrics=["PF"]) if is_main else None
    states, logs = model.fit(loader, steps=steps, key=key, states=states,
                             progbar=pb,
                             ckpt_dir=cfg.ckpt_dir if is_main else None,
                             scalar_logger=scalar_logger,
                             montage_dir=montage_dir)
    logger.info("done: %s", logs)


def _image_loop(cfg, mesh, args, key, task, is_main):
    import jax
    import jax.numpy as jnp
    import cv2
    from vwfd_tpu.data import SyntheticImageDataset, Loader
    from vwfd_tpu.data.masks import free_form_stroke_mask
    from vwfd_tpu.data.images import ImageFolderDataset
    from vwfd_tpu.models.image_model import ImageImmunizationModel, ImageBatch
    from vwfd_tpu.models.state import save_checkpoint
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

    loader = Loader(_Wrapped(), dcfg.batch_size, seed=cfg.train.seed,
                    sharding=_loader_sharding(mesh), ratio=dcfg.ratio)
    model = ImageImmunizationModel(cfg, task=task, mesh=mesh,
                                   with_jpeg_simulator=args.jpeg_simulator)
    # real-libjpeg pairs for the simulator (IRN_model.py:735-760 recipe):
    # host-side PIL compression of the clean batch at a random drawn QF
    from vwfd_tpu.attacks.jpeg import jpeg_real
    key, k0 = jax.random.split(key)
    states = model.init_states(k0)
    ckpt_dir, step, states = _resume_states(cfg, args, task, states, logger)

    if args.val:
        acc = []
        prev = None
        for i, (img, canny, mask) in enumerate(loader):
            if i >= args.val_batches + 1:
                break
            batch = ImageBatch(jnp.asarray(img), jnp.asarray(canny),
                               jnp.asarray(mask))
            if prev is None:
                prev = batch.image
                continue
            key, k = jax.random.split(key)
            out = model.eval_step(states, batch, prev, k)
            acc.append({k2: float(v) for k2, v in out.items()
                        if hasattr(v, "ndim") and v.ndim == 0})
            prev = batch.image
        logger.info("eval: %s", {k2: float(np.mean([m[k2] for m in acc]))
                                 for k2 in acc[0]})
        return

    scalar_logger, _ = _telemetry(cfg, args, is_main)
    steps = args.steps or cfg.train.niter
    pb = Progbar(steps, stateful_metrics=["PF", "PB"]) if is_main else None
    prev = None
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
                pair = (jnp.asarray(jpeg_real(np.asarray(img), q)),
                        jnp.full((np.shape(img)[0],), q / 100.0, jnp.float32))
                states, logs = model.train_step(states, batch, prev, k,
                                                jpeg_pair=pair)
            else:
                states, logs = model.train_step(states, batch, prev, k)
            prev = batch.image
            step += 1
            vals = [(k2, float(v)) for k2, v in logs.items()]
            if pb is not None:
                pb.add(1, values=vals)
            if scalar_logger is not None:
                scalar_logger.log(step, **dict(vals))
            if is_main and step % cfg.train.save_interval == 0:
                save_checkpoint(ckpt_dir, step, states)
    logger.info("done")


def _resume_states(cfg, args, task, states, logger):
    """Shared checkpoint/resume wiring for the non-video loops (the
    reference's save_training_state/resume_training, base_model.py:129-150)."""
    from vwfd_tpu.models.state import restore_checkpoint, latest_step
    ckpt_dir = f"{cfg.ckpt_dir}_{task}"
    step = 0
    if args.resume:
        step0 = latest_step(ckpt_dir)
        if step0 is not None:
            logger.info("resuming %s from step %d", task, step0)
            states = restore_checkpoint(ckpt_dir, step0, states)
            step = step0
    return ckpt_dir, step, states


def _message_loop(cfg, mesh, args, key, task, is_main):
    import jax
    import jax.numpy as jnp
    from vwfd_tpu.data import SyntheticImageDataset, Loader
    from vwfd_tpu.models.state import save_checkpoint
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
    if mesh is not None:
        from vwfd_tpu.parallel import replicate
        states = replicate(states, mesh)
    ckpt_dir, step, states = _resume_states(cfg, args, task, states, logger)
    if dcfg.root and not dcfg.synthetic:
        # real images from data.root, like every other family (the message
        # models train on COCO crops in their upstreams)
        from vwfd_tpu.data.images import ImageFolderDataset
        base = ImageFolderDataset(dcfg.root, size=dcfg.gt_size)

        class _ImgOnly:
            def __len__(self):
                return len(base)

            def __getitem__(self, i):
                item = base[i]
                return item["image"] if isinstance(item, dict) else item
        dataset = _ImgOnly()
    else:
        dataset = SyntheticImageDataset(size=dcfg.gt_size, length=2000,
                                        seed=cfg.train.seed)
    loader = Loader(dataset, dcfg.batch_size, seed=cfg.train.seed,
                    sharding=_loader_sharding(mesh), ratio=dcfg.ratio)
    scalar_logger, _ = _telemetry(cfg, args, is_main)
    steps = args.steps or cfg.train.niter
    pb = (Progbar(steps, stateful_metrics=["bitwise_error"])
          if is_main else None)
    rng = np.random.default_rng(cfg.train.seed)
    sharding = _loader_sharding(mesh)
    while step < steps:
        for imgs in loader:
            if step >= steps:
                break
            msgs = np.asarray(
                (rng.random((np.shape(imgs)[0], model.message_length)) > 0.5)
                .astype(np.float32))
            msgs = (jax.device_put(msgs, sharding) if sharding is not None
                    else jnp.asarray(msgs))
            key, k = jax.random.split(key)
            states, logs = model.train_step(states, jnp.asarray(imgs), msgs, k)
            step += 1
            vals = [(k2, float(v)) for k2, v in logs.items()]
            if pb is not None:
                pb.add(1, values=vals)
            if scalar_logger is not None:
                scalar_logger.log(step, **dict(vals))
            if is_main and step % cfg.train.save_interval == 0:
                save_checkpoint(ckpt_dir, step, states)
    logger.info("done")


def _kdjpeg_loop(cfg, mesh, args, key, is_main):
    import jax
    import jax.numpy as jnp
    from vwfd_tpu.data.jpeg_data import LQJpegDataset
    from vwfd_tpu.data import Loader
    from vwfd_tpu.models.kdjpeg_model import KDJpegModel
    from vwfd_tpu.models.state import save_checkpoint
    from vwfd_tpu.utils import Progbar, setup_logger

    logger = setup_logger("base")
    dcfg = cfg.data
    ds = LQJpegDataset(root=None if dcfg.synthetic else dcfg.root,
                       size=dcfg.gt_size, synthetic_length=2000,
                       seed=cfg.train.seed)
    # NB: the loader is NOT device-sharded here — collate() reorders the
    # (B, Q+1) grid into the class-major (Q·B) layout first; the flat batch
    # is placed on the mesh afterwards.
    loader = Loader(ds, max(1, dcfg.batch_size // 6), seed=cfg.train.seed,
                    ratio=dcfg.ratio)
    model = KDJpegModel(cfg, qf_classes=6, size=dcfg.gt_size)
    key, k0 = jax.random.split(key)
    states = model.init_states(k0)
    if mesh is not None:
        from vwfd_tpu.parallel import replicate
        states = replicate(states, mesh)
    ckpt_dir, step, states = _resume_states(cfg, args, "kdjpeg", states, logger)
    sharding = _loader_sharding(mesh)
    scalar_logger, _ = _telemetry(cfg, args, is_main)
    steps = args.steps or cfg.train.niter
    pb = Progbar(steps, stateful_metrics=["PSSIMU"]) if is_main else None
    while step < steps:
        for versions, labels in loader:
            if step >= steps:
                break
            flat, lab = KDJpegModel.collate(versions, labels, qf_classes=6)
            if sharding is not None:
                flat = jax.device_put(flat, sharding)
                lab = jax.device_put(lab, sharding)
            key, k = jax.random.split(key)
            states, logs = model.train_step(states, jnp.asarray(flat),
                                            jnp.asarray(lab), k)
            step += 1
            vals = [(k2, float(v)) for k2, v in logs.items()]
            if pb is not None:
                pb.add(1, values=vals)
            if scalar_logger is not None:
                scalar_logger.log(step, **dict(vals))
            if is_main and step % cfg.train.save_interval == 0:
                save_checkpoint(ckpt_dir, step, states)
    logger.info("done")


def _tianchi_loop(cfg, mesh, args, key, is_main):
    import jax
    import jax.numpy as jnp
    from vwfd_tpu.data import SyntheticVideoDataset, Loader
    from vwfd_tpu.data.images import ImageFolderDataset
    from vwfd_tpu.models.tianchi_model import TianchiModel
    from vwfd_tpu.models.state import save_checkpoint
    from vwfd_tpu.utils import Progbar, setup_logger

    logger = setup_logger("base")
    dcfg = cfg.data
    if dcfg.root and not dcfg.synthetic:
        # real image + forgery-mask pairs at gt_size (the reference's
        # tianchi_dataset.py:16-77 — 512² in training.yaml)
        if not dcfg.mask_root:
            raise SystemExit("tianchi with data.root requires data.mask_root "
                             "(forgery-mask dir, tianchi_dataset.py:16-77)")
        ds = ImageFolderDataset(dcfg.root, size=dcfg.gt_size, augment=False,
                                mask_root=dcfg.mask_root)

        def batches(item):
            return item["image"], item["mask"]
    else:
        base = SyntheticVideoDataset(size=dcfg.gt_size, frames=1, length=2000,
                                     seed=cfg.train.seed)

        class _Img:
            """Composed splice forgeries (donor pasted through the mask) —
            the reference's tianchi data are forged images + masks
            (tianchi_dataset.py:16-77); an image with an independent mask
            is unlearnable label noise."""

            def __len__(self):
                return len(base)

            def __getitem__(self, i):
                video, mask = base[i]
                donor, _ = base[(i * 7919 + 1) % len(base)]
                img = video[0] * (1 - mask[0]) + donor[0] * mask[0]
                return {"image": img.astype(np.float32), "mask": mask[0]}
        ds = _Img()

        def batches(item):
            return item["image"], item["mask"]
    loader = Loader(ds, dcfg.batch_size, seed=cfg.train.seed,
                    sharding=_loader_sharding(mesh), ratio=dcfg.ratio)
    model = TianchiModel(cfg)
    key, k0 = jax.random.split(key)
    states = model.init_states(k0)
    if mesh is not None:
        from vwfd_tpu.parallel import replicate
        states = replicate(states, mesh)
    ckpt_dir, step, states = _resume_states(cfg, args, "tianchi", states,
                                            logger)
    scalar_logger, _ = _telemetry(cfg, args, is_main)
    steps = args.steps or cfg.train.niter
    pb = Progbar(steps) if is_main else None
    while step < steps:
        for item in loader:
            if step >= steps:
                break
            images, masks = batches(item)
            key, k = jax.random.split(key)
            states, logs = model.train_step(states, jnp.asarray(images),
                                            jnp.asarray(masks), k)
            step += 1
            vals = [(k2, float(v)) for k2, v in logs.items()]
            if pb is not None:
                pb.add(1, values=vals)
            if scalar_logger is not None:
                scalar_logger.log(step, **dict(vals))
            if is_main and step % cfg.train.save_interval == 0:
                save_checkpoint(ckpt_dir, step, states)
    logger.info("done")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default=None, help="YAML config path")
    ap.add_argument("--task", type=str, default=None,
                    help="video | pami | clr | imuge | hidden | mbrs | "
                         "kdjpeg | tianchi")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--val", action="store_true", help="run evaluation")
    ap.add_argument("--val-batches", type=int, default=10)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--root", type=str, default=None,
                    help="override data.root (e.g. a DAVIS tree with "
                         "JPEGImages/480p + Annotations/480p — "
                         "data/Dataloader.py:59-99; or an image folder for "
                         "the image families)")
    ap.add_argument("--mask-root", type=str, default=None,
                    help="override data.mask_root (tianchi forgery masks)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--logdir", type=str, default=None,
                    help="scalar/TensorBoard dir (default runs/<name>_<task>)")
    ap.add_argument("--no-telemetry", action="store_true",
                    help="disable the ScalarLogger + montage dumps")
    ap.add_argument("--jpeg-simulator", dest="jpeg_simulator",
                    action="store_true",
                    help="co-train the FBCNN JPEG simulator against real "
                         "libjpeg pairs (IRN_model.py:735-760)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from vwfd_tpu.config import load_config
    from vwfd_tpu.parallel import (make_mesh, maybe_init_distributed,
                                   is_main_process)
    from vwfd_tpu.utils import setup_logger

    maybe_init_distributed()
    is_main = is_main_process()
    logger = setup_logger("base")
    cfg = load_config(args.config)
    if args.task:
        cfg = dataclasses.replace(cfg, task=args.task)
    if args.synthetic:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, synthetic=True))
    if args.root:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, root=args.root,
                                          synthetic=False))
    if args.mask_root:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, mask_root=args.mask_root))

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    logger.info("devices: %s (mesh=%s) task=%s process=%d/%d", jax.devices(),
                mesh, cfg.task, jax.process_index(), jax.process_count())

    key = jax.random.PRNGKey(cfg.train.seed)
    if cfg.task == "video":
        _video_loop(cfg, mesh, args, key, is_main)
    elif cfg.task in ("pami", "clr", "imuge", "image"):
        _image_loop(cfg, mesh, args, key,
                    "pami" if cfg.task == "image" else cfg.task, is_main)
    elif cfg.task in ("hidden", "mbrs"):
        _message_loop(cfg, mesh, args, key, cfg.task, is_main)
    elif cfg.task == "kdjpeg":
        _kdjpeg_loop(cfg, mesh, args, key, is_main)
    elif cfg.task == "tianchi":
        _tianchi_loop(cfg, mesh, args, key, is_main)
    else:
        raise SystemExit(f"unknown task {cfg.task!r}")


if __name__ == "__main__":
    main()
