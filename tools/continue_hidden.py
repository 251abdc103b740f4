"""Continue HiDDeN combined-pool training with hard-member oversampling
(VERDICT r4 #2b/#2c).

The r4 record (runs/hidden_r4_eval.json) left crop at 0.109 and cropout at
0.466 (≈ chance) bitwise error with encoded PSNR 25.6 dB. This continuation
restores the committed checkpoint and trains further with

  * a WEIGHTED combined noiser (models/hidden_model.py::make_combined_noiser)
    oversampling the hard spatial members, and
  * an optional raised encoder-loss weight (``--w-enc``) to push encoded
    PSNR toward the paper's ~30 dB operating point.

Per-member eval (incl. the paper-geometry cropout p=0.30) runs periodically
in-line; JSONL to --out. Reference: hidden_models/hidden.py:105-107 (metric),
encoder_decoder.py:8-29 (pipeline).

Usage:
    python tools/continue_hidden.py --from-ckpt checkpoints_hidden \
        --steps 10000 --weights 0.5,2,3,1,0.5,1 --w-enc 1.0 \
        --ckpt-dir checkpoints_hidden_r5 --out runs/hidden_r5.jsonl
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
    ap.add_argument("--from-ckpt", default="checkpoints_hidden")
    ap.add_argument("--from-step", type=int, default=None)
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--weights", default="0.5,2,3,1,0.5,1",
                    help="noise-pool draw weights: identity,crop,cropout,"
                         "dropout,gaussian,jpeg_mask")
    ap.add_argument("--w-enc", type=float, default=1.0,
                    help="encoder (image fidelity) loss weight; the r4 run "
                         "used the reference 0.7 and landed at 25.6 dB")
    ap.add_argument("--eval-every", type=int, default=1000)
    ap.add_argument("--eval-batches", type=int, default=16)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--save-every", type=int, default=2500)
    ap.add_argument("--ckpt-dir", default="checkpoints_hidden_r5")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from vwfd_tpu.attacks.spatial import cropout
    from vwfd_tpu.data import SyntheticImageDataset, Loader
    from vwfd_tpu.metrics import bitwise_message_error
    from vwfd_tpu.models.hidden_model import (HiddenModel, NOISE_POOL,
                                              make_combined_noiser)
    from vwfd_tpu.models.state import (latest_step, restore_checkpoint,
                                       save_checkpoint)

    weights = [float(s) for s in args.weights.split(",")]
    model = HiddenModel(image_size=args.size,
                        encoder_loss_weight=args.w_enc,
                        noiser=make_combined_noiser(weights))
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

    members = dict(NOISE_POOL)
    members["cropout_paper_p30"] = lambda k, e, c: cropout(
        k, e, c, height_ratio=0.5477, width_ratio=0.5477)

    @jax.jit
    def encode(states, imgs, msgs):
        return model.encoder.apply(
            {"params": states["encoder"].params,
             **states["encoder"].variables}, imgs, msgs, train=False)

    @jax.jit
    def decode(states, noised):
        return model.decoder.apply(
            {"params": states["decoder"].params,
             **states["decoder"].variables}, noised, train=False)

    attack_jits = {n: jax.jit(f) for n, f in members.items()}
    eval_ds = SyntheticImageDataset(size=args.size,
                                    length=args.eval_batches * args.batch,
                                    seed=123)

    def run_eval(states, key):
        rng = np.random.default_rng(0)
        errs = {n: [] for n in members}
        psnrs = []
        for bi in range(args.eval_batches):
            imgs = jnp.asarray(np.stack(
                [eval_ds[bi * args.batch + j] for j in range(args.batch)]),
                jnp.float32)
            msgs = jnp.asarray(
                (rng.random((args.batch, model.message_length)) > 0.5)
                .astype(np.float32))
            enc = encode(states, imgs, msgs)
            d = np.asarray(enc, np.float32) - np.asarray(imgs, np.float32)
            psnrs.append(-10 * np.log10(np.mean(d * d) + 1e-12))
            for n, f in attack_jits.items():
                key, k = jax.random.split(key)
                dec = decode(states, f(k, enc, imgs))
                errs[n].append(float(bitwise_message_error(dec, msgs)))
        return {"encoded_psnr_db": round(float(np.mean(psnrs)), 2),
                "bitwise_error": {n: round(float(np.mean(v)), 4)
                                  for n, v in errs.items()}}

    emit({"config": True, "from_step": int(step0), "steps": args.steps,
          "weights": weights, "w_enc": args.w_enc, "batch": args.batch,
          "pool": [n for n, _ in NOISE_POOL]})

    ds = SyntheticImageDataset(size=args.size, length=2000, seed=10)
    loader = Loader(ds, args.batch, seed=10, ratio=200)
    rng = np.random.default_rng(10)
    key = jax.random.PRNGKey(step0)
    step = step0
    t0 = time.time()
    target = step0 + args.steps
    while step < target:
        for imgs in loader:
            if step >= target:
                break
            msgs = jnp.asarray(
                (rng.random((np.shape(imgs)[0], model.message_length)) > 0.5)
                .astype(np.float32))
            key, k = jax.random.split(key)
            states, logs = model.train_step(states, jnp.asarray(imgs), msgs, k)
            step += 1
            if step % args.log_every == 0:
                emit({"step": step, "wall": round(time.time() - t0, 1),
                      **{k2: float(v) for k2, v in logs.items()}})
            if step % args.eval_every == 0 or step == target:
                key, ke = jax.random.split(key)
                emit({"step": step, "eval": True, **run_eval(states, ke)})
            if step % args.save_every == 0 or step == target:
                save_checkpoint(args.ckpt_dir, step, states)


if __name__ == "__main__":
    main()
