"""Convergence runs for the non-video trainable families (VERDICT r4 #1).

The five orchestrators that were step-tested but never *trained* — PAMI,
CLR, imuge (models/IRNp_model.py:449, IRNclr_model.py:428, IRN_model.py:603),
KD-JPEG (IRNrhi_model.py:425-527), tianchi (tianchi_model.py:262-301) — plus
MBRS (mbrs_models/) each get a real training run here with the task-specific
quality evaluation the reference's purpose implies:

  pami/imuge : recovery (backward) PSNR + localization F1 via eval_step
  clr        : same + the apex-regression L1 error on held-out crops
  kdjpeg     : simulator-vs-real-libjpeg PSNR at the conditioned QF, compared
               against (a) identity (no simulation) and (b) a fixed-QF
               conditioning baseline; QF-classifier accuracy
  tianchi    : held-out mask F1 (f1_sweep best threshold)
  mbrs       : bitwise message error through REAL libjpeg (PIL oracle,
               noise_layers/jpeg.py:10-45 semantics) at QF 50/70/90,
               plus encoded PSNR

Data is the on-device synthetic family (no media/egress in this environment
— BASELINE.md); geometry follows the reference YAMLs: 512^2 for PAMI/CLR
(options/train/train_IRNclr_x4.yml:38-39) and tianchi (training.yaml
IMG_SIZE), 256^2 for imuge/kdjpeg, 128^2 for MBRS.

Writes JSONL to --out (train records + {"eval": ...} records); checkpoints
to --ckpt-dir. Usage:
    python tools/run_family_convergence.py --task pami --steps 5000 \
        --size 512 --batch 3 --reverse-k 3 --out runs/conv_r5_pami.jsonl
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _open_out(path):
    if path is None:
        return None
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    return open(path, "a")


def _emit(f, rec):
    line = json.dumps({k: (float(v) if hasattr(v, "item") else v)
                       for k, v in rec.items()})
    if f is not None:
        f.write(line + "\n")
        f.flush()
    print(line, flush=True)


def _maybe_resume(args, states):
    """Restore latest checkpoint from --ckpt-dir when --resume; returns
    (start_step, states)."""
    if not (args.resume and args.ckpt_dir):
        return 0, states
    from vwfd_tpu.models.state import restore_checkpoint, latest_step
    s0 = latest_step(args.ckpt_dir)
    if s0 is None:
        return 0, states
    return s0, restore_checkpoint(args.ckpt_dir, s0, states)


# --------------------------------------------------------------- image family


def _image_family(args, cfg, key, out):
    import cv2
    import jax
    import jax.numpy as jnp
    from vwfd_tpu.data import SyntheticImageDataset, Loader
    from vwfd_tpu.data.masks import free_form_stroke_mask
    from vwfd_tpu.models.image_model import ImageImmunizationModel, ImageBatch
    from vwfd_tpu.models.state import save_checkpoint

    class _Wrapped:
        """Image + host canny + stroke mask (train.py _image_loop; the
        reference computes canny in LQGT_dataset.py:64-74)."""

        def __init__(self, seed, length):
            self.base = SyntheticImageDataset(size=args.size, length=length,
                                              seed=seed)
            self.rng = np.random.default_rng(seed)

        def __len__(self):
            return len(self.base)

        def __getitem__(self, idx):
            img = self.base[idx]
            gray = cv2.cvtColor((img * 255).astype(np.uint8),
                                cv2.COLOR_RGB2GRAY)
            canny = cv2.Canny(gray, 100, 200).astype(np.float32) / 255.0
            mask = free_form_stroke_mask(self.rng, (args.size, args.size))
            return img, canny[..., None], mask[..., None]

    loader = Loader(_Wrapped(cfg.train.seed, 2000), args.batch,
                    seed=cfg.train.seed, ratio=200)
    eval_loader = Loader(_Wrapped(cfg.train.seed + 7777, 64),
                         args.eval_batch or args.batch,
                         seed=cfg.train.seed + 7777, ratio=200)
    model = ImageImmunizationModel(cfg, task=args.task,
                                   reverse_k=args.reverse_k)
    key, k0 = jax.random.split(key)
    states = model.init_states(k0)
    step0, states = _maybe_resume(args, states)

    def run_eval(states, key):
        accs = []
        prev = None
        for i, (img, canny, mask) in enumerate(eval_loader):
            if i >= args.eval_batches + 1:
                break
            batch = ImageBatch(jnp.asarray(img), jnp.asarray(canny),
                               jnp.asarray(mask))
            if prev is None:
                prev = batch.image
                continue
            key, k = jax.random.split(key)
            o = model.eval_step(states, batch, prev, k)
            accs.append({
                "psnr_forward": float(o["psnr_forward"]),
                "psnr_backward": float(o["psnr_backward"]),
                "ssim_forward": float(o["ssim_forward"]),
                "f1_best": float(o["f1_best"]),
                "f1_per_attack_mean": float(jnp.mean(o["f1_per_attack"])),
            })
            prev = batch.image
        return {k: float(np.mean([a[k] for a in accs])) for k in accs[0]}

    prev = None
    step = step0
    t0 = time.time()
    while step < args.steps:
        for img, canny, mask in loader:
            if step >= args.steps:
                break
            batch = ImageBatch(jnp.asarray(img), jnp.asarray(canny),
                               jnp.asarray(mask))
            if prev is None:
                prev = batch.image
                continue
            key, k = jax.random.split(key)
            states, logs = model.train_step(states, batch, prev, k)
            prev = batch.image
            step += 1
            if step % args.log_every == 0 or step == 1:
                rec = {"step": step, "wall": time.time() - t0}
                rec.update({k2: float(v) for k2, v in logs.items()
                            if hasattr(v, "item")})
                _emit(out, rec)
            if step % args.eval_every == 0 or step == args.steps:
                key, ke = jax.random.split(key)
                ev = run_eval(states, ke)
                _emit(out, {"step": step, "eval": True, **ev})
            if args.ckpt_dir and step % args.save_every == 0:
                save_checkpoint(args.ckpt_dir, step, states)
    if args.ckpt_dir:
        save_checkpoint(args.ckpt_dir, step, states)


# --------------------------------------------------------------------- kdjpeg


def _kdjpeg(args, cfg, key, out):
    import jax
    import jax.numpy as jnp
    from vwfd_tpu.data import Loader
    from vwfd_tpu.data.jpeg_data import LQJpegDataset
    from vwfd_tpu.data.synthetic import SyntheticImageDataset
    from vwfd_tpu.metrics import psnr255_int
    from vwfd_tpu.models.kdjpeg_model import KDJpegModel
    from vwfd_tpu.models.state import save_checkpoint

    qualities = (10, 30, 50, 70, 90)
    ds = LQJpegDataset(root=None, size=args.size, qualities=qualities,
                       synthetic_length=2000, seed=cfg.train.seed)
    loader = Loader(ds, max(1, args.batch // 6), seed=cfg.train.seed,
                    ratio=200)
    model = KDJpegModel(cfg, qf_classes=6, size=args.size)
    key, k0 = jax.random.split(key)
    states = model.init_states(k0)
    step0, states = _maybe_resume(args, states)

    # held-out eval set: clean images + real-libjpeg versions per class,
    # compressed by the SAME dataset encoder the training batches use
    # (PIL-default 4:2:0 chroma subsampling — `jpeg_real`'s 4:4:4 is a
    # different artifact distribution and read as chance-level classifier
    # accuracy in the first r5 run)
    held = SyntheticImageDataset(size=args.size, length=args.eval_batch or 8,
                                 seed=cfg.train.seed + 7777)
    clean = np.stack([held[i] for i in range(len(held))])  # (E,H,W,3)
    real = {q: np.stack([ds._jpeg(c, q) for c in clean]) for q in qualities}

    @jax.jit
    def _classify(params, variables, x):
        _, logits = model.localizer.apply({"params": params, **variables}, x)
        return jnp.argmax(logits, -1)

    def run_eval(states):
        rec = {}
        psnr_cond, psnr_fixed, psnr_ident = [], [], []
        correct = total = 0
        for ci, q in enumerate(qualities, start=1):
            qf01 = jnp.full((clean.shape[0], 1), ci / 5.0, jnp.float32)
            sim = np.asarray(model.simulate(states, jnp.asarray(clean), qf01))
            # fixed-QF conditioning baseline: always claim class of QF 50
            qf_fix = jnp.full((clean.shape[0], 1), 3 / 5.0, jnp.float32)
            sim_fix = np.asarray(
                model.simulate(states, jnp.asarray(clean), qf_fix))
            tgt = real[q]
            psnr_cond.append(float(psnr255_int(jnp.asarray(sim),
                                               jnp.asarray(tgt))))
            psnr_fixed.append(float(psnr255_int(jnp.asarray(sim_fix),
                                                jnp.asarray(tgt))))
            psnr_ident.append(float(psnr255_int(jnp.asarray(clean),
                                                jnp.asarray(tgt))))
            pred = np.asarray(_classify(states["localizer"].params,
                                        states["localizer"].variables,
                                        jnp.asarray(tgt)))
            correct += int((pred == ci).sum())
            total += pred.size
            rec[f"psnr_sim_q{q}"] = psnr_cond[-1]
            # per-QF no-simulation baseline: PSNR(clean, real-JPEG) — at high
            # QF libjpeg barely changes the image, so "beats identity" is
            # only a meaningful bar where this number is low (low QF)
            rec[f"psnr_identity_q{q}"] = psnr_ident[-1]
        # clean class (0) accuracy
        pred0 = np.asarray(_classify(states["localizer"].params,
                                     states["localizer"].variables,
                                     jnp.asarray(clean)))
        correct += int((pred0 == 0).sum())
        total += pred0.size
        rec.update({
            "psnr_sim_conditioned": float(np.mean(psnr_cond)),
            "psnr_sim_fixed_qf": float(np.mean(psnr_fixed)),
            "psnr_identity": float(np.mean(psnr_ident)),
            "qf_classifier_acc": correct / total,
        })
        return rec

    step = step0
    t0 = time.time()
    while step < args.steps:
        for versions, labels in loader:
            if step >= args.steps:
                break
            flat, lab = KDJpegModel.collate(versions, labels, qf_classes=6)
            key, k = jax.random.split(key)
            # aux terms ramp in over steps 250-1000: the synthetic family
            # saturates the QF classifier ~1000x faster than real data, so
            # the reference's full-strength CE/GAN from step 0 shreds the
            # simulator before its pixel loss has a foothold
            ramp = np.float32(np.clip((step - 250) / 750.0, 0.0, 1.0))
            states, logs = model.train_step(states, jnp.asarray(flat),
                                            jnp.asarray(lab), k,
                                            aux_ramp=ramp)
            step += 1
            if step % args.log_every == 0 or step == 1:
                rec = {"step": step, "wall": time.time() - t0}
                rec.update({k2: float(v) for k2, v in logs.items()})
                _emit(out, rec)
            if step % args.eval_every == 0 or step == args.steps:
                _emit(out, {"step": step, "eval": True, **run_eval(states)})
            if args.ckpt_dir and step % args.save_every == 0:
                save_checkpoint(args.ckpt_dir, step, states)
    if args.ckpt_dir:
        save_checkpoint(args.ckpt_dir, step, states)


# -------------------------------------------------------------------- tianchi


def _tianchi(args, cfg, key, out):
    import jax
    import jax.numpy as jnp
    from vwfd_tpu.data import SyntheticVideoDataset, Loader
    from vwfd_tpu.models.tianchi_model import TianchiModel
    from vwfd_tpu.models.state import save_checkpoint

    def img_ds(seed, length):
        base = SyntheticVideoDataset(size=args.size, frames=1, length=length,
                                     seed=seed)

        class _Img:
            """Composed splice forgeries: donor content pasted through the
            mask (the reference's tianchi data are forged images + their
            masks, tianchi_dataset.py:16-77). A raw (image, independent
            mask) pair is label noise — the net can only find the mask if
            the FORGERY is in the pixels."""

            def __len__(self):
                return len(base)

            def __getitem__(self, i):
                video, mask = base[i]
                donor, _ = base[(i * 7919 + 1) % len(base)]
                img = video[0] * (1 - mask[0]) + donor[0] * mask[0]
                return img.astype(np.float32), mask[0]
        return _Img()

    loader = Loader(img_ds(cfg.train.seed, 2000), args.batch,
                    seed=cfg.train.seed, ratio=200)
    eval_loader = Loader(img_ds(cfg.train.seed + 7777, 64),
                         args.eval_batch or args.batch,
                         seed=cfg.train.seed + 7777, ratio=200)
    model = TianchiModel(cfg)
    key, k0 = jax.random.split(key)
    states = model.init_states(k0)
    step0, states = _maybe_resume(args, states)

    def run_eval(states):
        f1s = []
        for i, (img, mask) in enumerate(eval_loader):
            if i >= args.eval_batches:
                break
            o = model.eval_step(states, jnp.asarray(img), jnp.asarray(mask))
            f1s.append(float(o["f1_best"]))
        return {"f1_best": float(np.mean(f1s))}

    step = step0
    t0 = time.time()
    while step < args.steps:
        for img, mask in loader:
            if step >= args.steps:
                break
            key, k = jax.random.split(key)
            states, logs = model.train_step(states, jnp.asarray(img),
                                            jnp.asarray(mask), k)
            step += 1
            if step % args.log_every == 0 or step == 1:
                rec = {"step": step, "wall": time.time() - t0}
                rec.update({k2: float(v) for k2, v in logs.items()})
                _emit(out, rec)
            if step % args.eval_every == 0 or step == args.steps:
                _emit(out, {"step": step, "eval": True, **run_eval(states)})
            if args.ckpt_dir and step % args.save_every == 0:
                save_checkpoint(args.ckpt_dir, step, states)
    if args.ckpt_dir:
        save_checkpoint(args.ckpt_dir, step, states)


# ----------------------------------------------------------------------- mbrs


def _mbrs(args, cfg, key, out):
    import jax
    import jax.numpy as jnp
    from vwfd_tpu.attacks.jpeg import jpeg_real
    from vwfd_tpu.data import SyntheticImageDataset, Loader
    from vwfd_tpu.metrics import psnr255_int, bitwise_message_error
    from vwfd_tpu.models.mbrs_model import MBRSModel
    from vwfd_tpu.models.state import save_checkpoint

    ds = SyntheticImageDataset(size=args.size, length=2000,
                               seed=cfg.train.seed)
    loader = Loader(ds, args.batch, seed=cfg.train.seed, ratio=200)
    model = MBRSModel(image_size=args.size)
    key, k0 = jax.random.split(key)
    states = model.init_states(k0)
    step0, states = _maybe_resume(args, states)
    rng = np.random.default_rng(cfg.train.seed)

    held = SyntheticImageDataset(size=args.size, length=args.eval_batch or 16,
                                 seed=cfg.train.seed + 7777)
    eval_imgs = np.stack([held[i] for i in range(len(held))])
    eval_msgs = (np.random.default_rng(7777)
                 .random((eval_imgs.shape[0], model.message_length)) > 0.5
                 ).astype(np.float32)

    @jax.jit
    def _encode(states, imgs, msgs):
        return model.encoder.apply(
            {"params": states["encoder"].params,
             **states["encoder"].variables}, imgs, msgs, train=False)

    @jax.jit
    def _decode(states, imgs):
        return model.decoder.apply(
            {"params": states["decoder"].params,
             **states["decoder"].variables}, imgs, train=False)

    def run_eval(states):
        enc = np.asarray(jnp.clip(_encode(states, jnp.asarray(eval_imgs),
                                          jnp.asarray(eval_msgs)), 0, 1))
        rec = {"psnr_encoded": float(psnr255_int(jnp.asarray(eval_imgs),
                                                 jnp.asarray(enc)))}
        # REAL libjpeg round trip — the method's entire claim (MBRS = JPEG-
        # robust watermarking); JpegTest oracle semantics
        for q in (50, 70, 90):
            attacked = jpeg_real(enc, q)
            dec = _decode(states, jnp.asarray(attacked))
            rec[f"bitwise_error_jpeg{q}"] = float(
                bitwise_message_error(dec, jnp.asarray(eval_msgs)))
        dec_id = _decode(states, jnp.asarray(enc))
        rec["bitwise_error_identity"] = float(
            bitwise_message_error(dec_id, jnp.asarray(eval_msgs)))
        return rec

    step = step0
    t0 = time.time()
    while step < args.steps:
        for imgs in loader:
            if step >= args.steps:
                break
            msgs = jnp.asarray(
                (rng.random((np.shape(imgs)[0], model.message_length)) > 0.5)
                .astype(np.float32))
            key, k = jax.random.split(key)
            states, logs = model.train_step(states, jnp.asarray(imgs), msgs, k)
            step += 1
            if step % args.log_every == 0 or step == 1:
                rec = {"step": step, "wall": time.time() - t0}
                rec.update({k2: float(v) for k2, v in logs.items()})
                _emit(out, rec)
            if step % args.eval_every == 0 or step == args.steps:
                _emit(out, {"step": step, "eval": True, **run_eval(states)})
            if args.ckpt_dir and step % args.save_every == 0:
                save_checkpoint(args.ckpt_dir, step, states)
    if args.ckpt_dir:
        save_checkpoint(args.ckpt_dir, step, states)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", required=True,
                    choices=["pami", "clr", "imuge", "kdjpeg", "tianchi",
                             "mbrs"])
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--reverse-k", type=int, default=0,
                    help="image family: bound the reverse fan-out (0 = full; "
                         "3 fits 512^2 b3 on one v5e — BASELINE.md r2)")
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--eval-batches", type=int, default=4)
    ap.add_argument("--eval-batch", type=int, default=None)
    ap.add_argument("--log-every", type=int, default=25)
    ap.add_argument("--save-every", type=int, default=1000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--resume", action="store_true",
                    help="restore the latest checkpoint in --ckpt-dir and "
                         "continue (extends a finished run)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from vwfd_tpu.config import load_config

    cfg_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "vwfd_tpu", "configs",
        {"pami": "pami", "clr": "clr", "imuge": "pami", "kdjpeg": "kdjpeg",
         "tianchi": "tianchi", "mbrs": "mbrs"}[args.task] + ".yaml")
    cfg = load_config(cfg_path)
    # geometry defaults follow the reference YAMLs (see module docstring)
    defaults = {"pami": (512, 3), "clr": (512, 3), "imuge": (256, 8),
                "kdjpeg": (256, 6), "tianchi": (512, 4), "mbrs": (128, 16)}
    dsize, dbatch = defaults[args.task]
    args.size = args.size or dsize
    args.batch = args.batch or dbatch
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, gt_size=args.size,
                                      batch_size=args.batch, synthetic=True))
    if args.lr is not None:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, lr=args.lr))
    if args.ckpt_dir:
        args.ckpt_dir = os.path.abspath(args.ckpt_dir)

    out = _open_out(args.out)
    _emit(out, {"config": True, "task": args.task, "size": args.size,
                "batch": args.batch, "steps": args.steps, "lr": cfg.train.lr,
                "reverse_k": args.reverse_k,
                "devices": str(jax.devices())})
    key = jax.random.PRNGKey(cfg.train.seed)
    if args.task in ("pami", "clr", "imuge"):
        _image_family(args, cfg, key, out)
    elif args.task == "kdjpeg":
        _kdjpeg(args, cfg, key, out)
    elif args.task == "tianchi":
        _tianchi(args, cfg, key, out)
    else:
        _mbrs(args, cfg, key, out)


if __name__ == "__main__":
    main()
