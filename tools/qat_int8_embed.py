"""Quantization-aware fine-tune probe for the int8 EMBED path (VERDICT r4 #8).

PTQ embed was rejected at −3.3 dB embedded-image PSNR
(runs/int8_gate_r4_10k_embed.txt). This probe asks whether a short QAT
fine-tune recovers a deployable int8 embed point: resume the trained
flagship and train ~1–2k further steps with **per-output-channel symmetric
weight fake-quant (STE)** applied to every learned netG conv kernel inside
the forward — the same weight-quant geometry `nets/inn_int8.py::_quant_w`
uses at deploy time — so the weights settle where int8 rounding costs
nothing. (Activation scales stay calibration-time, as in the PTQ path:
weight rounding is the hypothesized PSNR sink because it compounds through
the coupling chain; if the gate still fails after weight-QAT the residual
is activation clipping, and that is the recorded conclusion.)

Then re-run the deploy gate:
    python tools/exp_int8_eval.py --ckpt-dir <out> --int8-embed

Usage:
    python tools/qat_int8_embed.py --from-ckpt /tmp/ckpt_r4_flagship \
        --steps 1500 --ckpt-dir /tmp/ckpt_r5_qat --out runs/qat_r5.jsonl
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fake_quant_tree(params):
    """Per-output-channel symmetric int8 fake-quant (STE) on every 4-D conv
    kernel of the netG tree — matches inn_int8._quant_w's geometry."""
    import jax
    import jax.numpy as jnp

    def fq(w):
        if w.ndim != 4:
            return w
        sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0
        wq = jnp.clip(jnp.round(w / sw), -127, 127) * sw
        return w + jax.lax.stop_gradient(wq - w)

    return jax.tree_util.tree_map(fq, params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from-ckpt", default="/tmp/ckpt_r4_flagship")
    ap.add_argument("--from-step", type=int, default=None)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--ckpt-dir", default="/tmp/ckpt_r5_qat")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from vwfd_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from vwfd_tpu.data import Loader, SyntheticVideoDataset
    from vwfd_tpu.models import VideoBatch, VideoWatermarkModel
    from vwfd_tpu.models.state import (latest_step, restore_checkpoint,
                                       save_checkpoint)

    class QATVideoModel(VideoWatermarkModel):
        """Flagship trainer with weight fake-quant inside the INN forward —
        training and eval both see the int8-rounded weights."""

        def _inn_forward(self, params, variables, x):
            return super()._inn_forward(fake_quant_tree(params), variables, x)

    cfg = Config(
        data=DataConfig(gt_size=args.size, batch_size=args.batch,
                        frames=args.frames),
        model=ModelConfig(inn_subnet="res_tpu2", inn_haar="conv",
                          inn_packed=True, extractor="unet_tpu",
                          extractor_enc_convs=(2, 2, 1, 1, 1)),
        train=TrainConfig(forward_criterion="l1"))
    model = QATVideoModel(cfg)
    states = model.init_states(jax.random.PRNGKey(0))
    step0 = (args.from_step if args.from_step is not None
             else latest_step(args.from_ckpt))
    assert step0 is not None, f"no checkpoint under {args.from_ckpt}"
    states = restore_checkpoint(args.from_ckpt, step0, states)

    out = None
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        out = open(args.out, "a")

    def emit(rec):
        line = json.dumps(rec)
        if out is not None:
            out.write(line + "\n")
            out.flush()
        print(line, flush=True)

    emit({"config": True, "qat": "weight_per_channel_ste",
          "from": args.from_ckpt, "from_step": int(step0),
          "steps": args.steps})

    ds = SyntheticVideoDataset(size=args.size, frames=args.frames,
                               length=2000, seed=10)
    loader = Loader(ds, args.batch, seed=10, ratio=200)
    key = jax.random.PRNGKey(step0)
    prev = None
    step = step0
    t0 = time.time()
    target = step0 + args.steps
    while step < target:
        for video, mask in loader:
            if step >= target:
                break
            batch = VideoBatch(jnp.asarray(video), jnp.asarray(mask))
            if prev is None:
                prev = batch.video
                continue
            key, k = jax.random.split(key)
            states, logs = model.train_step(states, batch, prev, k)
            prev = batch.video
            step += 1
            if step % args.log_every == 0:
                emit({"step": step, "wall": round(time.time() - t0, 1),
                      **{k2: float(v) for k2, v in logs.items()}})
    save_checkpoint(args.ckpt_dir, step, states)
    emit({"saved": args.ckpt_dir, "step": step})


if __name__ == "__main__":
    main()
