"""Flagship video watermarking trainer — the TPU re-design of `IRNcropModel`
(models/IRNcrop_model.py, the only model reachable from train.py).

Train step (IRNcrop_model.py:325-451), all inside ONE jitted, donated program:
  1. INN embeds the watermark: frames channel-stacked (T·3 = 12, the netG
     `dims_in=[[12,·,·]]`), forward through the invertible chain, then
     clamp-with-grad + straight-through 8-bit quantization (:343-345).
  2. Splice tamper: fwd·(1−mask) + previous_batch·mask (:348).
  3. 5-way per-frame attack pool mixed by softmax α (:350-373) — fused
     `attack_pool_video`, with the *intended* mixture semantics (the committed
     loop drops the images, a documented bug we do not copy).
  4. UNet predicts the per-frame tamper mask (:376).
  5. Losses: BCE-with-logits forward-fidelity with PSNR-gated weight
     (1.0 below 33 dB else 0.8, :378-393) + mask BCE; joint AdamW update of
     the INN and UNet with grad-clip 1.0 (:407-416).
  6. `previous_images` ring buffer carried as explicit state (:445-450).

The PSNR gate is a `jnp.where` on the loss weight — same math, no host sync.
Randomness is an explicit PRNG key per step (the reference draws np/torch
globals mid-step).
"""

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..attacks import attack_pool_video
from ..config import Config
from ..metrics import bce_with_logits, psnr255_int, f1_sweep, ssim
from ..nets import InvertibleNet, UNet, UNetTPU
from ..ops.quantize import clamp_with_grad, ste_quantize_255
from .state import NetState, make_optimizer


class VideoBatch(NamedTuple):
    video: jnp.ndarray  # (B, T, H, W, 3) in [0,1]
    mask: jnp.ndarray   # (B, T, H, W, 1) in {0,1}


def _to_channels(video):
    """(B, T, H, W, C) → (B, H, W, T·C) — the 12-channel INN input layout."""
    b, t, h, w, c = video.shape
    return jnp.moveaxis(video, 1, -2).reshape(b, h, w, t * c)


def _to_frames(x, t):
    """(B, H, W, T·C) → (B, T, H, W, C)."""
    b, h, w, tc = x.shape
    return jnp.moveaxis(x.reshape(b, h, w, t, tc // t), -2, 1)


class VideoWatermarkModel:
    """Builds the two trainable nets of the reachable path (netG INN +
    `generator` UNet — the only two whose optimizers step,
    IRNcrop_model.py:407-416) and exposes jitted train/eval/infer functions."""

    def __init__(self, cfg: Config, mesh=None, attack_ratios=None):
        self.cfg = cfg
        self.mesh = mesh
        self.frames = cfg.data.frames
        mc, tc = cfg.model, cfg.train
        self.attack_ratios = (attack_ratios if attack_ratios is not None
                              else mc.attack_ratios)

        # bf16 compute (the TPU analog of the reference's fp16 AMP,
        # IRNcrop_model.py:143,340); params and losses stay f32.
        self.compute_dtype = jnp.bfloat16 if tc.dtype == "bfloat16" else None
        self.inn = InvertibleNet(
            channels=3 * self.frames, down_num=mc.inn_down_num,
            block_num=mc.inn_block_num, subnet=mc.inn_subnet,
            width=mc.inn_width, fused_st=mc.fused_st, haar=mc.inn_haar,
            # bf16 transpose-then-quantize epilogue: interacts with the Haar
            # impl (fps matrix in BASELINE.md r3 layout study) — the promoted
            # (conv-Haar, bf16-epilogue) pair is the measured optimum
            out_f32=self.compute_dtype is None,
            dtype=self.compute_dtype)
        if mc.inn_packed and not (mc.inn_subnet == "res_tpu2" and
                                  mc.fused_st):
            raise ValueError("inn_packed requires inn_subnet='res_tpu2' "
                             "with fused_st=True (nets/inn_packed.py)")
        self.inn_packed = mc.inn_packed
        if mc.extractor in ("unet_tpu", "unet_tpu_slim", "unet_tpu2"):
            self.unet = UNetTPU(out_channels=1,
                                init_features=mc.extractor_features,
                                slim_skip=mc.extractor == "unet_tpu_slim",
                                enc_convs=(mc.extractor_enc_convs
                                           if mc.extractor_enc_convs
                                           is not None else
                                           1 if mc.extractor == "unet_tpu2"
                                           else 2),
                                s2d=mc.extractor_s2d,
                                head_impl=mc.extractor_head,
                                up_impl=mc.extractor_up,
                                dec_impl=mc.extractor_dec,
                                dtype=self.compute_dtype)
        else:
            self.unet = UNet(out_channels=1, init_features=mc.unet_features,
                             dtype=self.compute_dtype)
        self.tx = make_optimizer(tc)

    # ------------------------------------------------------------------ init

    def init_states(self, key) -> Dict[str, NetState]:
        s = self.cfg.data.gt_size
        k1, k2 = jax.random.split(key)
        x12 = jnp.zeros((1, s, s, 3 * self.frames), jnp.float32)
        inn_vars = self.inn.init(k1, x12)
        x3 = jnp.zeros((1, s, s, 3), jnp.float32)
        unet_vars = self.unet.init(k2, x3)
        states = {
            "netG": NetState.create(
                self.inn.apply, inn_vars["params"],
                {k: v for k, v in inn_vars.items() if k != "params"}, self.tx),
            "generator": NetState.create(
                self.unet.apply, unet_vars["params"],
                {k: v for k, v in unet_vars.items() if k != "params"}, self.tx),
        }
        if self.cfg.model.pretrain_path:
            from .state import apply_pretrain
            import logging
            states = apply_pretrain(states, self.cfg.model.pretrain_path,
                                    logging.getLogger("base"))
        if self.mesh is not None:
            from ..parallel import replicate
            states = replicate(states, self.mesh)
        return states

    # ------------------------------------------------------------ forward ops

    def _inn_forward(self, params, variables, x):
        """INN forward — module path, or the packed-space executor
        (nets/inn_packed.py, value-identical, same param tree) when
        `ModelConfig.inn_packed` is set."""
        if self.inn_packed:
            from ..nets import inn_packed
            return inn_packed.forward(
                params, x, channels=3 * self.frames,
                down_num=self.cfg.model.inn_down_num,
                dtype=self.compute_dtype,
                out_f32=self.compute_dtype is None)
        return self.inn.apply({"params": params, **variables}, x)

    def embed(self, states, video):
        """Watermark-embed a video clip: INN fwd + clamp + quantize."""
        if self.compute_dtype is not None:
            # cast before the frame→channel transpose: the INN casts at entry
            # anyway, and transposing f32 doubles the copy traffic (r3 profile)
            video = video.astype(self.compute_dtype)
        x = _to_channels(video)
        fwd = self._inn_forward(states["netG"].params,
                                states["netG"].variables, x)
        fwd = _to_frames(fwd, self.frames)  # bf16 transpose, then f32 quantize
        return ste_quantize_255(clamp_with_grad(fwd.astype(jnp.float32)))

    def predict_mask(self, states, video, train=False):
        """UNet tamper mask per frame; frames folded into batch."""
        b, t, h, w, c = video.shape
        flat = video.reshape(b * t, h, w, c)
        gen = states["generator"]
        if train:
            out, new_vars = self.unet.apply(
                {"params": gen.params, **gen.variables}, flat, train=True,
                mutable=["batch_stats"])
            return out.reshape(b, t, h, w, 1), new_vars
        out = self.unet.apply({"params": gen.params, **gen.variables}, flat,
                              train=False)
        return out.reshape(b, t, h, w, 1)

    # -------------------------------------------------------------- train step

    def _loss(self, params, states, batch: VideoBatch, prev_images, key):
        tc = self.cfg.train
        video, mask = batch.video, batch.mask
        b, t = video.shape[0], video.shape[1]

        # named scopes flow into XLA op metadata for both the forward ops and
        # their transposes — tools/exp_profile_pipeline.py --mode train uses
        # them to attribute device time to pipeline stages
        with jax.named_scope("Sembed"):
            x = _to_channels(video.astype(self.compute_dtype)
                             if self.compute_dtype is not None else video)
            fwd = self._inn_forward(params["netG"],
                                    states["netG"].variables, x)
            fwd_video = _to_frames(fwd, t)  # bf16 transpose, then f32 quantize
            fwd_video = ste_quantize_255(
                clamp_with_grad(fwd_video.astype(jnp.float32)))

        with jax.named_scope("Sattack"):
            # splice tamper with the previous batch (IRNcrop_model.py:348)
            attacked_fwd = fwd_video * (1.0 - mask) + prev_images * mask

            k_atk, _ = jax.random.split(key)
            attacked = attack_pool_video(k_atk, attacked_fwd,
                                         ratios=self.attack_ratios)
            attacked = ste_quantize_255(clamp_with_grad(attacked))

        with jax.named_scope("Sextract"):
            flat = attacked.reshape(b * t, *attacked.shape[2:])
            pred, new_unet_vars = self.unet.apply(
                {"params": params["generator"],
                 **states["generator"].variables},
                flat, train=True, mutable=["batch_stats"])
            pred_mask = pred.reshape(b, t, *pred.shape[1:])

        psnr_forward = jax.lax.stop_gradient(psnr255_int(video, fwd_video))
        w_fwd = jnp.where(psnr_forward < tc.psnr_gate,
                          tc.loss_weight_low, tc.loss_weight_high)
        # NB: parity quirk — the reference feeds *images* through
        # BCEWithLogitsLoss for forward fidelity (IRNcrop_model.py:378-388)
        # and the sigmoid-activated UNet output for the mask loss (:391-393).
        # BCE's minimum is the logit of the target (saturates pixels), so
        # config can swap in l1/l2 for from-scratch training.
        if tc.forward_criterion == "l1":
            l_fid = jnp.mean(jnp.abs(fwd_video - video))
        elif tc.forward_criterion == "l2":
            l_fid = jnp.mean((fwd_video - video) ** 2)
        else:
            l_fid = bce_with_logits(fwd_video, video)
        l_forward = w_fwd * l_fid
        l_backward = bce_with_logits(pred_mask, mask)
        loss = l_forward + l_backward
        aux = {
            "lF": l_forward, "lB": l_backward, "PF": psnr_forward,
            "unet_vars": new_unet_vars,
        }
        return loss, aux

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, states, batch: VideoBatch, prev_images, key):
        # `states` is donated: the params + AdamW (m, v) trees for both nets
        # alias their output buffers in-place instead of allocating ~3× the
        # param bytes fresh each step (callers all rebind `states`; on CPU
        # test runs donation is a no-op).
        params = {"netG": states["netG"].params,
                  "generator": states["generator"].params}
        (loss, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
            params, states, batch, prev_images, key)
        new_states = {
            "netG": states["netG"].apply_gradients(grads["netG"]),
            "generator": states["generator"].apply_gradients(
                grads["generator"]).replace(variables=aux["unet_vars"]),
        }
        # failure guard (reference has none, SURVEY.md §5), in-step so it
        # composes with donation: on a non-finite loss every leaf keeps its
        # pre-step value — params, optimizer (m, v), step counter, batch_stats
        good = jnp.isfinite(loss)
        new_states = jax.tree_util.tree_map(
            lambda new, old: jnp.where(good, new, old), new_states, states)
        logs = {"loss": loss, "lF": aux["lF"], "lB": aux["lB"], "PF": aux["PF"]}
        return new_states, logs

    # ------------------------------------------------------------------- eval

    @functools.partial(jax.jit, static_argnums=0)
    def eval_step(self, states, batch: VideoBatch, prev_images, key):
        """Embed → splice → attack → localize; returns quality + F1 metrics."""
        video, mask = batch.video, batch.mask
        fwd_video = self.embed(states, video)
        attacked_fwd = fwd_video * (1.0 - mask) + prev_images * mask
        attacked = attack_pool_video(key, attacked_fwd,
                                     ratios=self.attack_ratios)
        attacked = jnp.clip(attacked, 0.0, 1.0)
        pred_mask = self.predict_mask(states, attacked, train=False)
        _, f1s = f1_sweep(pred_mask, mask)
        return {
            "psnr_forward": psnr255_int(video, fwd_video),
            "ssim_forward": ssim(
                fwd_video.reshape(-1, *fwd_video.shape[2:]),
                video.reshape(-1, *video.shape[2:])),
            "f1_best": jnp.max(f1s),
            "f1_sweep": f1s,
        }

    @functools.partial(jax.jit, static_argnums=0)
    def extract_f1(self, states, attacked, mask):
        """Best-threshold F1 of the extractor on pre-attacked frames —
        building block for host-side (non-differentiable) attack evals."""
        pred = self.predict_mask(states, attacked, train=False)
        _, f1s = f1_sweep(pred, mask)
        return jnp.max(f1s)

    def eval_real_jpeg(self, states, batch: VideoBatch, prev_images,
                       qualities=(50, 70, 90)):
        """Real-libjpeg robustness eval — the reference's `JpegTest`
        behavioral oracle (noise_layers/jpeg.py:10-45) applied to the full
        embed → splice-tamper → compress → extract pipeline: the
        watermarked+tampered frames round-trip through actual libjpeg (PIL,
        HOST-side) at each QF before localization. Returns
        {"none": f1, "qf50": f1, ...}. Eval-only (one host round-trip per
        QF); training keeps the differentiable pool."""
        from ..attacks.jpeg import jpeg_real
        video, mask = batch.video, batch.mask
        fwd = self.embed(states, video)
        tampered = jnp.clip(fwd * (1.0 - mask) + prev_images * mask, 0.0, 1.0)
        b, t, h, w, c = tampered.shape
        frames = np.asarray(tampered.reshape(b * t, h, w, c), np.float32)
        out = {"none": float(self.extract_f1(states, tampered, mask))}
        for q in qualities:
            att = jnp.asarray(
                jpeg_real(frames, q).reshape(b, t, h, w, c))
            out[f"qf{q}"] = float(self.extract_f1(states, att, mask))
        return out

    # ------------------------------------------------------------------ loop

    def fit(self, loader, steps: int, key=None, states=None, log_every=None,
            progbar=None, ckpt_dir=None, scalar_logger=None, montage_dir=None):
        """Epoch/iter loop (train.py:91-109) with the previous-images ring
        buffer carried host-side (device arrays, no transfers).

        Mirrors the reference's telemetry: scalars per step (SummaryWriter,
        IRNcrop_model.py:399-400 — here `ScalarLogger`) and periodic
        qualitative montages (stitch_images every `montage_interval`,
        IRNcrop_model.py:421-437)."""
        from .state import save_checkpoint
        tc = self.cfg.train
        key = key if key is not None else jax.random.PRNGKey(tc.seed)
        if states is None:
            key, k0 = jax.random.split(key)
            states = self.init_states(k0)
        prev = None
        step = 0
        logs_out = {}
        while step < steps:
            for item in loader:
                if step >= steps:
                    break
                video, mask = item
                batch = VideoBatch(jnp.asarray(video), jnp.asarray(mask))
                if prev is None:
                    prev = batch.video  # first batch only seeds the buffer
                    continue
                key, k = jax.random.split(key)
                # train_step donates `states` and carries the non-finite-loss
                # guard in-step (params/opt/batch_stats keep their pre-step
                # values on a bad batch) — always rebind
                states, logs = self.train_step(states, batch, prev, k)
                step += 1
                logs_out = {k2: float(v) for k2, v in logs.items()}
                if not np.isfinite(logs_out["loss"]):
                    import logging
                    logging.getLogger("base").warning(
                        "non-finite loss at step %d — update skipped "
                        "(in-step guard kept the pre-step state)", step)
                if progbar is not None:
                    progbar.add(1, values=list(logs_out.items()))
                if scalar_logger is not None:
                    scalar_logger.log(step, **logs_out)
                if montage_dir and step % tc.montage_interval == 0:
                    self._dump_montage(states, batch, prev, key, montage_dir,
                                       step)
                prev = batch.video
                if ckpt_dir and step % tc.save_interval == 0:
                    save_checkpoint(ckpt_dir, step, states)
        return states, logs_out

    def _dump_montage(self, states, batch, prev, key, out_dir, step):
        """Qualitative dump: input / embedded / 10×|diff| / attacked /
        predicted mask / GT mask for frame 0 (IRNcrop_model.py:421-437)."""
        import os
        from ..attacks import attack_pool_video
        from ..utils.images import stitch_images

        fwd = self.embed(states, batch.video)
        tampered = fwd * (1 - batch.mask) + prev * batch.mask
        attacked = jnp.clip(attack_pool_video(key, tampered,
                                              ratios=self.attack_ratios), 0, 1)
        pred = self.predict_mask(states, attacked, train=False)
        img = stitch_images(
            np.asarray(batch.video[:, 0]),
            np.asarray(fwd[:, 0]),
            np.asarray(jnp.clip(10 * jnp.abs(batch.video[:, 0] - fwd[:, 0]), 0, 1)),
            np.asarray(attacked[:, 0]),
            np.asarray(pred[:, 0]),
            np.asarray(batch.mask[:, 0]),
        )
        os.makedirs(out_dir, exist_ok=True)
        img.save(os.path.join(out_dir, f"{step:05d}.png"))
