"""Convergence run for the flagship video trainer (VERDICT r1 #6).

Runs N train steps on DAVIS when `--root` points at a real DAVIS tree, else
on the synthetic DAVIS-like generator (this environment has no media and no
egress — see scripts/download_davis.sh), logging mask-BCE, forward PSNR and
a periodic F1 sweep, for both `forward_criterion` modes:
  * `bce`  — reference parity (IRNcrop_model.py:378-388)
  * `l1`   — the from-scratch-stable default (configs/video.yaml)

Writes JSONL to --out; summarize into BASELINE.md.
Usage: python tools/run_convergence.py --steps 2000 --criterion l1
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--criterion", default="l1", choices=["l1", "l2", "bce"])
    ap.add_argument("--root", default=None, help="DAVIS root (JPEGImages/480p)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--eval-every", type=int, default=200)
    ap.add_argument("--extractor", default="unet",
                    help="unet (reference-exact) | unet_tpu (MXU-shaped)")
    ap.add_argument("--subnet", default="res",
                    help="INN coupling subnet: res (reference-exact) | "
                         "res_tpu (MXU-shaped) | dense")
    ap.add_argument("--s2d", type=int, default=2,
                    help="UNetTPU space-to-depth stem factor")
    ap.add_argument("--efeatures", type=int, default=64,
                    help="UNetTPU channel base")
    ap.add_argument("--block-num", default=None,
                    help="INN coupling schedule, e.g. '0,2,1' (default: "
                         "reference 1,1,1)")
    ap.add_argument("--haar", default="lift",
                    help="INN Haar impl: lift | conv | mixed (ops/haar.py)")
    ap.add_argument("--packed", action="store_true",
                    help="packed-space INN executor (nets/inn_packed.py)")
    ap.add_argument("--econvs", default=None,
                    help="UNetTPU per-level encoder-conv plan, e.g. "
                         "'2,1,1,1,1' (enc1..enc4, bottleneck)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--bce-finetune-at", type=int, default=0,
                    help="switch forward_criterion to bce at this step — "
                         "the reference's actual operating regime is "
                         "fine-tune-from-pretrained under BCE "
                         "(IRNcrop_model.py:152-178,378-388); l1-pretrain "
                         "then bce-finetune reproduces it from scratch. "
                         "0 = off")
    ap.add_argument("--libjpeg-batches", type=int, default=4,
                    help="final real-libjpeg robustness eval: N fresh "
                         "batches through embed→splice→libjpeg(QF 50/70/90)→"
                         "extract F1 (JpegTest oracle, noise_layers/"
                         "jpeg.py:10-45); 0 disables")
    ap.add_argument("--ckpt-dir", default=None,
                    help="save the final train state here (orbax, "
                         "models/state.py) — feeds the int8 PTQ eval "
                         "(tools/exp_int8_eval.py) and serving smoke runs")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from vwfd_tpu.config import Config, DataConfig, TrainConfig
    from vwfd_tpu.data import Loader
    from vwfd_tpu.models import VideoWatermarkModel, VideoBatch

    from vwfd_tpu.config import ModelConfig
    cfg = Config(
        data=DataConfig(gt_size=args.size, batch_size=args.batch,
                        frames=args.frames),
        model=ModelConfig(extractor=args.extractor, inn_subnet=args.subnet,
                          extractor_s2d=args.s2d,
                          extractor_features=args.efeatures,
                          inn_haar=args.haar,
                          inn_packed=args.packed,
                          extractor_enc_convs=(tuple(
                              int(s) for s in args.econvs.split(","))
                              if args.econvs else None),
                          **({"inn_block_num": tuple(
                              int(s) for s in args.block_num.split(","))}
                             if args.block_num else {})),
        train=TrainConfig(forward_criterion=args.criterion))
    if args.root:
        from vwfd_tpu.data.davis import DavisVideoDataset
        ds = DavisVideoDataset(args.root, size=args.size, frames=args.frames)
        source = "davis"
    else:
        # Generate synthetic DAVIS-like clips ON DEVICE: host generation
        # (~0.5 s/batch) or uploading a cached set (~16 MB/step, or a one-off
        # 1.6 GB) through the axon tunnel dominates the run otherwise.
        ds = None
        source = "synthetic"
    model = VideoWatermarkModel(cfg)
    key = jax.random.PRNGKey(0)
    key, k0 = jax.random.split(key)
    states = model.init_states(k0)

    def batches():
        if ds is not None:  # real dataset: host loader
            loader = Loader(ds, args.batch, seed=0)
            while True:
                for video, mask in loader:
                    yield jnp.asarray(video), jnp.asarray(mask)
        else:  # on-device synthetic generator (zero host IO per step)
            from vwfd_tpu.ops.resize import resize_bilinear
            from vwfd_tpu.attacks.spatial import rect_mask

            s, t, b = args.size, args.frames, args.batch

            @jax.jit
            def gen(k):
                k1, k2, k3, k4 = jax.random.split(k, 4)
                # smooth "natural" content: bilinear-upsampled coarse noise
                # plus a slowly-drifting per-frame offset (video-like motion)
                coarse = jax.random.uniform(k1, (b, 1, 16, 16, 3))
                drift = 0.05 * jax.random.normal(k2, (b, t, 1, 1, 3))
                video = jnp.clip(
                    resize_bilinear(coarse, (s, s)) + drift, 0.0, 1.0)
                video = jnp.broadcast_to(video, (b, t, s, s, 3))
                # tamper mask: random rectangle per sample (rate < ~0.2)
                h0 = jax.random.uniform(k3, (b, 2)) * (0.7 * s)
                sz = 0.15 * s + jax.random.uniform(k4, (b, 2)) * (0.25 * s)
                m = jax.vmap(lambda a, z: rect_mask(
                    (s, s), (a[0], a[0] + z[0], a[1], a[1] + z[1])))(h0, sz)
                mask = jnp.broadcast_to(m[:, None, :, :, None],
                                        (b, t, s, s, 1))
                return video, mask

            k = jax.random.PRNGKey(1234)
            while True:
                k, kk = jax.random.split(k)
                yield gen(kk)

    out_path = args.out or f"/tmp/convergence_{args.criterion}.jsonl"
    f = open(out_path, "w")
    # stamp the net config so logs are self-describing (r3 lesson: a session
    # restart orphaned logs whose configs lived only in shell history)
    f.write(json.dumps({"config": {
        "subnet": args.subnet, "extractor": args.extractor,
        "s2d": args.s2d, "efeatures": args.efeatures,
        "haar": args.haar,
        "block_num": args.block_num or "1,1,1", "size": args.size,
        "batch": args.batch, "frames": args.frames,
        "criterion": args.criterion}}) + "\n")
    f.flush()
    prev = None
    step = 0
    t0 = time.time()
    gen = batches()
    import dataclasses
    while step < args.steps:
        video, mask = next(gen)
        batch = VideoBatch(video, mask)
        if prev is None:
            prev = batch.video
            continue
        if args.bce_finetune_at and step == args.bce_finetune_at:
            # same states/param trees, new loss closure — the l1→bce handoff
            cfg_bce = dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train,
                                               forward_criterion="bce"))
            model = VideoWatermarkModel(cfg_bce)
            f.write(json.dumps({"step": step, "event": "bce_finetune"})
                    + "\n")
        key, k = jax.random.split(key)
        states, logs = model.train_step(states, batch, prev, k)
        step += 1
        if step % 20 == 0 or step == 1:
            rec = {"step": step, "criterion": args.criterion,
                   "source": source,
                   **{kk: float(v) for kk, v in logs.items()}}
            if step % args.eval_every == 0 or step == args.steps:
                key, ke = jax.random.split(key)
                ev = model.eval_step(states, batch, prev, ke)
                rec.update(psnr_forward=float(ev["psnr_forward"]),
                           ssim_forward=float(ev["ssim_forward"]),
                           f1_best=float(ev["f1_best"]))
            rec["wall_s"] = round(time.time() - t0, 1)
            f.write(json.dumps(rec) + "\n")
            f.flush()
            print(rec)
        prev = batch.video
    if args.libjpeg_batches > 0:
        # real-libjpeg robustness: the differentiable-pool F1 above is only
        # a training-domain proxy; this is the JpegTest-oracle number
        accs = {}
        for _ in range(args.libjpeg_batches):
            video, mask = next(gen)
            batch = VideoBatch(video, mask)
            res = model.eval_real_jpeg(states, batch, prev)
            for kk, v in res.items():
                accs.setdefault(kk, []).append(v)
            prev = batch.video
        rec = {"step": step, "libjpeg_f1": {
            kk: round(float(np.mean(v)), 4) for kk, v in accs.items()},
            "batches": args.libjpeg_batches}
        f.write(json.dumps(rec) + "\n")
        print(rec)
    f.close()
    if args.ckpt_dir:
        from vwfd_tpu.models.state import save_checkpoint
        save_checkpoint(args.ckpt_dir, step, states)
        print("saved checkpoint", args.ckpt_dir, "step", step)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
