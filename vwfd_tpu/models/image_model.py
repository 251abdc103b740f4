"""Still-image immunization family — the IRN / IRN-PAMI / CLRNet orchestrators
(models/IRN_model.py:603+, models/IRNp_model.py:449+, models/IRNclr_model.py:428+).

Shared skeleton (SURVEY.md §3.2), all inside one jitted step:
  1. 4-ch INN embed: netG(concat(img, canny)) → (immunized RGB, null channel)
     (IRNclr_model.py:462-467).
  2. Tamper: splice with previous batch through the stroke mask
     (IRNp_model.py:499,561-601; masks precomputed host-side).
  3. k-way attack fan-out, concatenated on the batch dim B→kB
     (IRNclr_model.py:504-546) — here a stacked vmap over the attack axis.
  4. Localizer predicts the tamper mask on every attacked copy; with
     `with_apex=True` a crop is applied first and the apex-regressor predicts
     the crop rectangle (IRNclr_model.py:570-617).
  5. Reverse pass: netG(concat(rectified, canny(rectified)), rev=True) →
     recovered image + recovered watermark channel (IRNclr_model.py:619-634)
     — the mid-step canny is the on-device `canny_soft`, not a CPU round trip.
  6. Losses with the reference's PSNR-gated weights: L1 forward + 16·null +
     L1 backward + canny-back + 0.01·perceptual + 0.01·SSIM
     (IRNcrop_model.py:558-600 / IRNclr_model.py:637-660).
"""

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..attacks import jpeg_pool, resize_roundtrip, gaussian_noise
from ..attacks.blur import gaussian_blur_attack, median_blur_attack
from ..attacks.spatial import (
    sample_crop_apex, copy_move_tamper, rect_mask, rectify_crop_pad,
)
from ..config import Config
from ..metrics import (
    bce_loss, l1_loss, psnr255_int, ssim, perceptual_loss, f1_sweep,
)
from ..nets import InvertibleNet, UNetDiscriminator, QFPredictor
from ..ops.canny import canny_soft
from ..ops.quantize import clamp_with_grad, ste_quantize_255
from ..ops.resize import crop_resize
from .state import NetState, make_optimizer


class ImageBatch(NamedTuple):
    image: jnp.ndarray   # (B, H, W, 3)
    canny: jnp.ndarray   # (B, H, W, 1)
    mask: jnp.ndarray    # (B, H, W, 1) stroke/splice tamper mask


_GRAY = None


class ImageImmunizationModel:
    """task: 'pami' (Imuge+/splice), 'clr' (CLRNet crop localization), or
    'imuge' (ImugeV2, IRN_model.py: the 4th channel carries a hidden
    *grayscale image* — the previous batch in gray, as IRNcrop_model.
    evaluate:465-471 builds its watermark — rather than the canny map)."""

    def __init__(self, cfg: Config, task: str = "pami",
                 n_attacks: Optional[int] = None,
                 with_apex: Optional[bool] = None, mesh=None,
                 attack_ratios=None, with_gan: bool = False,
                 adversarial_weight: float = 0.01,
                 with_jpeg_simulator: bool = False,
                 tamper_mode: Optional[str] = None,
                 copy_move_prob: float = 1.0 / 3.0,
                 reverse_k: Optional[int] = None,
                 use_perceptual: bool = False):
        self.cfg = cfg
        self.task = task
        self.n_attacks = (n_attacks if n_attacks is not None
                          else cfg.model.n_attacks)
        self.watermark_source = "gray_prev" if task == "imuge" else "canny"
        self.with_apex = task == "clr" if with_apex is None else with_apex
        self.with_gan = with_gan
        self.adversarial_weight = adversarial_weight
        self.with_jpeg_simulator = with_jpeg_simulator
        self.use_perceptual = use_perceptual
        # Tamper distribution: "splice" pastes the previous batch through the
        # stroke mask; "copymove" self-pastes a randomly shifted copy
        # (IRNp_model.py:561-601); "mixed" draws copy-move with probability
        # `copy_move_prob` per step (the reference alternates on
        # global_step % 3 == 1, i.e. 1/3 of steps). PAMI defaults to mixed.
        if tamper_mode is None:
            tamper_mode = "mixed" if task == "pami" else "splice"
        self.tamper_mode = tamper_mode
        self.copy_move_prob = copy_move_prob
        # How many of the k attacked copies feed the reverse pass: the
        # reference reverses the full kB fan-out (IRNclr_model.py:548,628-634,
        # IRNp_model.py:609-637); 0 = all (parity default), smaller ints bound
        # memory on small hosts.
        self.reverse_k = 0 if reverse_k is None else reverse_k
        self.mesh = mesh
        self.attack_ratios = (attack_ratios if attack_ratios is not None
                              else cfg.model.attack_ratios)
        mc, tc = cfg.model, cfg.train

        # 4-ch INN (RGB + canny), PAMI composite (IRNp_model.py:158-171,
        # IRNclr_model.py:151). bf16 compute = the TPU analog of the
        # reference's fp16 AMP (IRNp runs under autocast); also what fits the
        # 512² k-way reverse in one v5e's HBM (params/losses stay f32).
        self.compute_dtype = (jnp.bfloat16 if tc.dtype == "bfloat16" else None)
        self.netG = InvertibleNet(channels=4, down_num=mc.inn_down_num,
                                  block_num=mc.inn_block_num,
                                  subnet=mc.inn_subnet,
                                  fused_st=mc.fused_st, haar=mc.inn_haar,
                                  dtype=self.compute_dtype)
        self.localizer = UNetDiscriminator(
            dim=mc.localizer_dim, residual_blocks=mc.localizer_residual_blocks,
            out_channels=1, use_sigmoid=True)
        if self.with_apex:
            # crop-apex regressor (QF_predictor(crop_pred), IRNclr_model.py:148)
            self.apex_net = QFPredictor(nc=(16, 24, 32, 48), nb=1, classes=4,
                                        crop_pred=True,
                                        out_size=cfg.data.gt_size)
        if self.with_gan:
            # patch-D on immunized images (IRNp_model.py:165,171 nsgan pair)
            from ..nets import Discriminator
            self.discriminator = Discriminator(dim=mc.discriminator_dim,
                                               use_sigmoid=True)
        if self.with_jpeg_simulator:
            # JPEG-simulator co-training (IRN_model.py:701-798): a small FBCNN
            # learns to mimic hard-round JPEG on the current immunized images,
            # and its (frozen) output replaces one attack branch so gradients
            # flow through a *learned* compression model.
            from ..nets import FBCNN
            self.jpeg_sim = FBCNN(nc=(16, 24, 32, 48), nb=1)
        # Pretrained VGG19 for the perceptual terms when configured
        # (TrainConfig.vgg_weights ← tools/convert_vgg19.py; the reference
        # loads torchvision's pretrained VGG19, loss.py:155-178). None keeps
        # the documented seeded-random fallback.
        if tc.vgg_weights:
            from ..metrics.perceptual import load_vgg_npz
            self.vgg_params = load_vgg_npz(tc.vgg_weights)
        else:
            self.vgg_params = None
        self.tx = make_optimizer(tc)

    def init_states(self, key) -> Dict[str, NetState]:
        s = self.cfg.data.gt_size
        ks = jax.random.split(key, 3)
        x4 = jnp.zeros((1, s, s, 4), jnp.float32)
        x3 = jnp.zeros((1, s, s, 3), jnp.float32)

        def mk(apply_fn, v):
            return NetState.create(apply_fn, v["params"],
                                   {k: x for k, x in v.items() if k != "params"},
                                   self.tx)
        states = {"netG": mk(self.netG.apply, self.netG.init(ks[0], x4)),
                  "localizer": mk(self.localizer.apply,
                                  self.localizer.init(ks[1], x3))}
        if self.with_apex:
            states["apex"] = mk(self.apex_net.apply,
                                self.apex_net.init(ks[2], x3))
        if self.with_gan:
            kd = jax.random.fold_in(key, 99)
            states["discriminator"] = mk(self.discriminator.apply,
                                         self.discriminator.init(kd, x3))
        if self.with_jpeg_simulator:
            kj = jax.random.fold_in(key, 123)
            states["jpeg_sim"] = mk(
                self.jpeg_sim.apply,
                self.jpeg_sim.init(kj, x3, jnp.zeros((1, 1), jnp.float32)))
        if self.cfg.model.pretrain_path:
            from .state import apply_pretrain
            import logging
            states = apply_pretrain(states, self.cfg.model.pretrain_path,
                                    logging.getLogger("base"))
        if self.mesh is not None:
            from ..parallel import replicate
            states = replicate(states, self.mesh)
        return states

    # --------------------------------------------------------------- pieces

    def embed(self, states, image, canny):
        fwd = self.netG.apply({"params": states["netG"].params,
                               **states["netG"].variables},
                              jnp.concatenate([image, canny], -1))
        rgb = ste_quantize_255(clamp_with_grad(fwd[..., :3]))
        null = fwd[..., 3:]
        return rgb, null

    def _attack_fanout(self, key, img):
        """k attacked copies stacked on a new leading axis (fan-out B→kB).
        Pool mirrors IRNclr_model.py:504-546: identity+quant, jpeg pool ×2,
        resize round-trip, median, gaussian blur (+noise beyond 6)."""
        ks = jax.random.split(key, self.n_attacks)
        pool = [
            lambda k, x: ste_quantize_255(x),
            lambda k, x: jpeg_pool(k, x),
            lambda k, x: (resize_roundtrip(k, x) if self.attack_ratios is None
                          else resize_roundtrip(k, x, ratios=self.attack_ratios)),
            lambda k, x: median_blur_attack(k, x),
            lambda k, x: gaussian_blur_attack(k, x),
            lambda k, x: jpeg_pool(k, x),
            lambda k, x: gaussian_noise(k, x),
        ]
        outs = [jnp.clip(pool[i % len(pool)](ks[i], img), 0.0, 1.0)
                for i in range(self.n_attacks)]
        return jnp.stack(outs, axis=0)  # (k, B, H, W, 3)

    # ----------------------------------------------------------- train step

    def _loss(self, params, states, batch: ImageBatch, prev_images, key,
              jpeg_pair=None):
        tc = self.cfg.train
        img, canny, mask = batch
        if self.watermark_source == "gray_prev":
            # ImugeV2: embed the grayscale of the previous batch
            # (IRNcrop_model.py:465-471 watermark construction)
            gray = jnp.asarray([0.299, 0.587, 0.114])
            canny = (prev_images @ gray)[..., None]
        b, h, w, _ = img.shape
        k_atk, k_crop = jax.random.split(key)

        # jax.named_scope stage markers (Iembed/Itamper/Iattack/Ilocalize/
        # Iapex/Ireverse) carry into the HLO op metadata so
        # tools/exp_image_profile.py can attribute device time per stage —
        # zero effect on the computation itself.
        with jax.named_scope("Iembed"):
            fwd_rgb, fwd_null = self._embed_p(params, states, img, canny)

        apex = None
        if self.task == "clr":
            # CLR tamper IS the crop (IRNclr_model.py:470-494): random rect
            # (rates 0.6–1.0 coupled within 0.2), bicubic upscale to full
            # size; GT mask = 1 OUTSIDE the crop.
            apex = sample_crop_apex(k_crop, (h, w), 0.6, 1.0)
            tampered = jnp.clip(
                crop_resize(fwd_rgb, apex, method="bicubic"), 0.0, 1.0)
            mask = (1.0 - rect_mask((h, w), apex))[None, ..., None] \
                * jnp.ones((b, 1, 1, 1))
        elif self.tamper_mode == "splice":
            tampered = fwd_rgb * (1.0 - mask) + prev_images * mask
        else:
            k_cm, k_sel = jax.random.split(jax.random.fold_in(k_crop, 7))
            cm_tampered, cm_mask = copy_move_tamper(k_cm, fwd_rgb, mask)
            if self.tamper_mode == "copymove":
                tampered, mask = cm_tampered, cm_mask
            else:  # mixed: copy-move on ~1/3 of steps (IRNp global_step%3==1)
                use_cm = jax.random.bernoulli(k_sel, self.copy_move_prob)
                splice = fwd_rgb * (1.0 - mask) + prev_images * mask
                tampered = jnp.where(use_cm, cm_tampered, splice)
                mask = jnp.where(use_cm, cm_mask, mask)
        tampered = jnp.clip(tampered, 0.0, 1.0)
        # remat: the k-copy attack fan-out's DCT/resize intermediates at 512²
        # are pure recompute — don't keep them for backward
        with jax.named_scope("Iattack"):
            attacked = jax.checkpoint(self._attack_fanout)(k_atk, tampered)
        aux_sim = {}
        if self.with_jpeg_simulator:
            k_q, _ = jax.random.split(k_crop)
            qs = jnp.asarray([50.0, 60.0, 70.0, 80.0, 90.0])
            q = qs[jax.random.randint(k_q, (), 0, 5)]
            qf_in = jnp.tile((q / 100.0)[None, None], (b, 1))
            if jpeg_pair is not None:
                # Reference recipe (IRN_model.py:735-760): the simulator
                # learns real libjpeg — sim(clean, QF) vs the dataset's
                # pre-compressed real-JPEG pair (jpeg_real_H from the LQ
                # pipeline, data/LQ_dataset.py), L1.
                jpeg_real, qf_real = jpeg_pair
                sim_out, _ = self.jpeg_sim.apply(
                    {"params": params["jpeg_sim"],
                     **states["jpeg_sim"].variables}, img, qf_real[:, None])
                l_sim = l1_loss(jnp.clip(sim_out, 0, 1),
                                jax.lax.stop_gradient(jpeg_real))
            else:
                # no real-JPEG pairs in the batch: fall back to the
                # differentiable hard-round JPEG as the target
                from ..attacks.jpeg import jpeg_basic
                scale = jnp.where(q >= 50, 2.0 - q * 0.02, 50.0 / q)
                target = jax.lax.stop_gradient(jpeg_basic(
                    jax.lax.stop_gradient(tampered), scale_factor=scale,
                    rounding="round"))
                sim_out, _ = self.jpeg_sim.apply(
                    {"params": params["jpeg_sim"],
                     **states["jpeg_sim"].variables},
                    jax.lax.stop_gradient(tampered), qf_in)
                l_sim = l1_loss(jnp.clip(sim_out, 0, 1), target)
            # frozen simulator as an extra attack branch on the LIVE tampered
            sim_attack, _ = self.jpeg_sim.apply(
                {"params": jax.lax.stop_gradient(params["jpeg_sim"]),
                 **states["jpeg_sim"].variables}, tampered, qf_in)
            sim_attack = jnp.clip(sim_attack, 0.0, 1.0)
            attacked = jnp.concatenate([attacked, sim_attack[None]], axis=0)
            aux_sim = {"l_sim": l_sim}
        k = attacked.shape[0]
        flat = attacked.reshape(k * b, h, w, 3)

        # ---- localizer (mask) on all attacked copies (rematerialized: the
        # kB-copy U-Net activations at 512² otherwise tip HBM over capacity)
        def _localize(p, z):
            return self.localizer.apply(
                {"params": p, **states["localizer"].variables},
                z, update_sn=True, mutable=["spectral"])

        # netG's share of the localizer CE (IRNp_model.py:820-825 vs :888):
        # the localizer trains on the FULL CE in its own optimizer step
        # (detached input) while netG receives only 0.01·CE through the live
        # attacked images. One forward reproduces both: the input VALUE is
        # unchanged but netG's gradient through it is scaled to the
        # reference's share (0.01 for pami/imuge; 0 for CLR, whose train
        # loss never contains this head — IRNclr localizer is eval-only,
        # :901 — its netG CE is the apex-net's, handled in aux_apex).
        ce_share = 0.0 if self.task == "clr" else 0.01
        flat_ce = flat * ce_share + jax.lax.stop_gradient(flat) * (
            1.0 - ce_share)
        with jax.named_scope("Ilocalize"):
            pred_mask, loc_vars = jax.checkpoint(_localize)(
                params["localizer"], flat_ce)
        pred_mask = pred_mask[0] if isinstance(pred_mask, tuple) else pred_mask
        gt_mask_exp = jnp.tile(mask, (k, 1, 1, 1))
        # Localizer criterion: BCE — the reference's
        # `CE = self.bce_loss(gen_fake, masks_GT_expand)`
        # (IRNp_model.py:820-833). Plain L1 here has a degenerate minimum at
        # the (near-)empty mask: measured on the r5 512² runs, held-out F1
        # collapsed 0.43 → 0.005 by step 1750 for PAMI and 0.44 → 0.16 by
        # step 1000 for CLR under L1 (runs/conv_r5_pami512_l1mask.jsonl).
        # Note the reference's CLR never trains THIS head at all (its
        # localizer appears only in eval, IRNclr_model.py:901); its trained
        # crop-mask output is the apex-net's, scored with SmoothL1 (:585) —
        # that term is preserved reference-exact in l_apex below.
        l_mask = bce_loss(pred_mask, gt_mask_exp)

        # ---- optional apex regression on the attacked copies (CLR,
        # IRNclr_model.py:570-617): the regressor trains on the detached
        # attacked images (the reference's separate optimizer step, :588-595)
        # and a CE term at γ=0.1 flows back to netG through the live attacked
        # images with the apex params frozen (:598-603, :668).
        aux_apex = {}
        apex_vars = None
        rectified = flat
        if self.with_apex:
            with jax.named_scope("Iapex"):
                target = jnp.stack([apex[0] / h, apex[1] / h,
                                    apex[2] / w, apex[3] / w])
                target = jnp.tile(target[None], (k * b, 1))
                (apex_mask, apex_pred), apex_vars = self.apex_net.apply(
                    {"params": params["apex"], **states["apex"].variables},
                    jax.lax.stop_gradient(flat),
                    mutable=["spectral", "batch_stats"])
                l_apex = (l1_loss(apex_pred, target)
                          + l1_loss(apex_mask, gt_mask_exp))
                (ce_mask, ce_pred), _ = self.apex_net.apply(
                    {"params": jax.lax.stop_gradient(params["apex"]),
                     **states["apex"].variables},
                    flat, mutable=["spectral", "batch_stats"])
                l_ce = l1_loss(ce_pred, target) + l1_loss(ce_mask, gt_mask_exp)
                aux_apex = {"l_apex": l_apex, "l_ce": l_ce}
                # scale-back rectification before the reverse pass
                # (IRNclr_model.py:556-575): attacked values pasted back at the
                # crop's original position, gradients through the clean forward.
                clean_exp = jnp.tile(fwd_rgb, (k, 1, 1, 1))
                rectified = rectify_crop_pad(flat, clean_exp, apex)

        # ---- reverse pass over the first n_rev attacked copies — the
        # reference reverses the FULL kB fan-out (IRNclr_model.py:548,628-634);
        # reverse_k > 0 bounds memory when configured.
        n_rev = k if self.reverse_k == 0 else min(self.reverse_k, k)
        rect_r = rectified[:n_rev * b]
        with jax.named_scope("Icanny"):
            canny_rect = canny_soft(rect_r)
        rev_in = jnp.concatenate([rect_r, canny_rect], -1)

        # jax.checkpoint: the k-way reverse at the reference's 512² would
        # otherwise store every coupling activation for backward (measured
        # 37 GB > 15.75 GB HBM on v5e at batch 3 ×6 copies); rematerializing
        # the reverse chain trades cheap recompute for fitting on one chip.
        def _reverse(p, z):
            out, _ = self.netG.apply(
                {"params": p, **states["netG"].variables}, z, rev=True)
            return out

        with jax.named_scope("Ireverse"):
            reversed_stuff = jax.checkpoint(_reverse)(params["netG"], rev_in)
        rev_rgb = jnp.clip(reversed_stuff[..., :3], 0.0, 1.0)
        rev_wm = jnp.clip(reversed_stuff[..., 3:], 0.0, 1.0)
        img_exp = jnp.tile(img, (n_rev, 1, 1, 1))
        canny_exp = jnp.tile(canny, (n_rev, 1, 1, 1))

        psnr_f = jax.lax.stop_gradient(psnr255_int(img, fwd_rgb))
        psnr_b = jax.lax.stop_gradient(psnr255_int(img_exp, rev_rgb))
        if self.task == "clr":
            # IRNclr_model.py:637-680 recipe: null channel targets the canny
            # map, a mask-normalized local backward term, PSNR-gated weights
            # (5/1.5 forward, 1.5/1 backward), γ=0.1 CE, 0.1 SSIM.
            l_forward = l1_loss(fwd_rgb, img) + l1_loss(fwd_null, canny)
            l_null = l1_loss(fwd_null, canny)
            l_backward = l1_loss(rev_rgb, img_exp) + l1_loss(rev_wm, canny_exp)
            mask_exp = gt_mask_exp[:n_rev * b]
            l_local = l1_loss(rev_rgb * mask_exp, img_exp * mask_exp) / (
                jnp.mean(mask_exp) + 1e-6)
            alpha_f = jnp.where(psnr_f < 35.0, 5.0, 1.5)
            alpha_b = jnp.where(psnr_f - psnr_b > 1.0, 1.5, 1.0)
            loss = alpha_f * l_forward + alpha_b * (l_backward + l_local)
            loss = loss + 0.1 * aux_apex["l_ce"] + aux_apex["l_apex"]
            loss = loss + 0.1 * (1.0 - ssim(fwd_rgb, img))
            loss = loss + l_mask
        else:
            # ---- losses: the PAMI recipe's OWN weights (IRNp_model.py:
            # 852-888), not IRNcrop's. The reference emphasizes the FORWARD
            # fidelity (3× when PSNR<35, backward only 0.75×, null 8× under
            # L2, localizer CE into netG at 0.01, mask-normalized local
            # backward 3× when the tamper covers >20%); perceptual/SSIM are
            # commented out of the committed IRNp path. The r5 512² run with
            # IRNcrop's inverted weighting (backward 8-10× forward) measured
            # PF degrading to ~25 dB (runs/conv_r5_pami512_l1mask.jsonl) —
            # these weights are what protects imperceptibility.
            from ..metrics import l2_loss
            l_forward = l1_loss(fwd_rgb, img)
            l_null = l2_loss(fwd_null, jnp.zeros_like(fwd_null))
            l_forward = l_forward + 8.0 * l_null
            l_backward = l1_loss(rev_rgb, img_exp) + l1_loss(rev_wm, canny_exp)
            mask_r = gt_mask_exp[:n_rev * b]
            l_local = l1_loss(rev_rgb * mask_r, img_exp * mask_r) / (
                1e-3 + jnp.mean(mask))
            if self.use_perceptual:
                # the reference's use_percept=True pathway
                # (IRNp_model.py:392-425 loss_forward_and_backward_imuge) —
                # constructed always, enabled per-call; off in the committed
                # IRNp step, so this is opt-in here too
                with jax.named_scope("Iperceptual"):
                    l_forward = l_forward + 0.01 * perceptual_loss(
                        fwd_rgb, img, params=self.vgg_params)
            alpha_f = jnp.where(psnr_f < 35.0, 3.0, 1.0)
            local_w = jnp.where(jnp.mean(mask) > 0.2, 3.0, 1.0)
            loss = alpha_f * l_forward + 0.75 * (l_backward
                                                 + local_w * l_local)
            # full CE drives the localizer; netG's 0.01 share rides the
            # ce_share-scaled input above
            loss = loss + l_mask
            if self.with_apex:
                loss = loss + aux_apex["l_apex"] + 0.1 * aux_apex["l_ce"]
        if self.with_jpeg_simulator:
            loss = loss + aux_sim["l_sim"]
        if self.with_gan:
            # generator adversarial term (nsgan, IRNp_model.py G step)
            from ..metrics import adversarial_loss
            # G term: grads flow to netG through fwd_rgb only — D params
            # stop-gradded (the reference runs this as a separate optimizer
            # step, IRNp_model.py; one fused program here)
            d_frozen = jax.lax.stop_gradient(params["discriminator"])
            d_on_fwd, disc_vars = self.discriminator.apply(
                {"params": d_frozen, **states["discriminator"].variables},
                fwd_rgb, update_sn=True, mutable=["spectral"])
            g_adv = adversarial_loss(d_on_fwd, True, False, loss_type="nsgan")
            loss = loss + self.adversarial_weight * g_adv
            # D term: real/fake BCE with the fake detached
            d_real, disc_vars = self.discriminator.apply(
                {"params": params["discriminator"], **disc_vars}, img,
                update_sn=True, mutable=["spectral"])
            d_fake, disc_vars = self.discriminator.apply(
                {"params": params["discriminator"], **disc_vars},
                jax.lax.stop_gradient(fwd_rgb),
                update_sn=True, mutable=["spectral"])
            d_loss = 0.5 * (
                adversarial_loss(d_real, True, True, loss_type="nsgan") +
                adversarial_loss(d_fake, False, True, loss_type="nsgan"))
            loss = loss + d_loss
            aux_apex = {**aux_apex, "g_adv": g_adv, "d_loss": d_loss,
                        "disc_vars": disc_vars}

        aux = {"lF": l_forward, "lB": l_backward, "l_mask": l_mask,
               "PF": psnr_f, "PB": psnr_b, "NULL": l_null,
               "loc_vars": loc_vars, "apex_vars": apex_vars, **aux_apex,
               **aux_sim}
        return loss, aux

    def _embed_p(self, params, states, img, canny):
        fwd = self.netG.apply({"params": params["netG"],
                               **states["netG"].variables},
                              jnp.concatenate([img, canny], -1))
        return (ste_quantize_255(clamp_with_grad(fwd[..., :3])), fwd[..., 3:])

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, states, batch: ImageBatch, prev_images, key,
                   jpeg_pair=None):
        """One fused update. `jpeg_pair=(jpeg_real, qf)` supplies real-libjpeg
        targets for the simulator (qf in [0,1]); None falls back to the
        differentiable hard-round target.

        `states` is donated — params + AdamW (m, v) buffers update in place
        (matters at 512²/batch 3 where the family is HBM-tight); the
        non-finite-loss guard runs in-step so callers always rebind."""
        params = {k: s.params for k, s in states.items()}
        (loss, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
            params, states, batch, prev_images, key, jpeg_pair)
        new_states = {
            "netG": states["netG"].apply_gradients(grads["netG"]),
            "localizer": states["localizer"].apply_gradients(
                grads["localizer"]).replace(variables=aux["loc_vars"]),
        }
        if self.with_apex:
            new_states["apex"] = states["apex"].apply_gradients(
                grads["apex"]).replace(variables=aux["apex_vars"])
        if self.with_gan:
            new_states["discriminator"] = states["discriminator"].apply_gradients(
                grads["discriminator"]).replace(variables=aux["disc_vars"])
        if self.with_jpeg_simulator:
            new_states["jpeg_sim"] = states["jpeg_sim"].apply_gradients(
                grads["jpeg_sim"])
        # in-step failure guard (SURVEY.md §5): non-finite loss → every leaf
        # keeps its pre-step value (composes with the donated buffers)
        good = jnp.isfinite(loss)
        new_states = jax.tree_util.tree_map(
            lambda new, old: jnp.where(good, new, old), new_states, states)
        logs = {k: v for k, v in aux.items()
                if k not in ("loc_vars", "apex_vars", "disc_vars")}
        logs["loss"] = loss
        return new_states, logs

    # ----------------------------------------------------------------- eval

    @functools.partial(jax.jit, static_argnums=0)
    def eval_step(self, states, batch: ImageBatch, prev_images, key):
        """Immunize → tamper → FULL k-way attack fan-out → localize → reverse;
        quality + F1 per attack branch (the folder protocol of
        IRNclr_model.evaluate:765-905 without IO — the reference evaluates
        through the whole 8-way fan-out, :827-876, not just quantization)."""
        img, canny, mask = batch
        b, h, w, _ = img.shape
        if self.watermark_source == "gray_prev":
            gray = jnp.asarray([0.299, 0.587, 0.114])
            canny = (prev_images @ gray)[..., None]
        fwd_rgb, fwd_null = self._embed_p(
            {k: s.params for k, s in states.items()}, states, img, canny)
        apex = None
        if self.task == "clr":
            # folder-protocol eval runs the rectified (padded) reverse
            # (IRNclr_model.py:827-899): crop tamper → attack → scale-back
            # zero-pad rectification → reverse.
            k_apex, key = jax.random.split(key)
            apex = sample_crop_apex(k_apex, img.shape[1:3], 0.6, 1.0)
            tampered = jnp.clip(
                crop_resize(fwd_rgb, apex, method="bicubic"), 0.0, 1.0)
            mask = (1.0 - rect_mask(img.shape[1:3], apex))[None, ..., None] \
                * jnp.ones((img.shape[0], 1, 1, 1))
        else:
            tampered = fwd_rgb * (1.0 - mask) + prev_images * mask
        attacked = self._attack_fanout(key, jnp.clip(tampered, 0.0, 1.0))
        k = attacked.shape[0]
        flat = attacked.reshape(k * b, h, w, 3)
        pred_mask, _ = self.localizer.apply(
            {"params": states["localizer"].params,
             **states["localizer"].variables}, flat)
        if self.task == "clr":
            flat = rectify_crop_pad(flat, jnp.tile(fwd_rgb, (k, 1, 1, 1)),
                                    apex)
        rev_in = jnp.concatenate([flat, canny_soft(flat)], -1)
        reversed_stuff, _ = self.netG.apply(
            {"params": states["netG"].params, **states["netG"].variables},
            rev_in, rev=True)
        rev_rgb = jnp.clip(reversed_stuff[..., :3], 0.0, 1.0)

        # per-attack metrics, vmapped over the k fan-out branches
        pred_k = pred_mask.reshape(k, b, h, w, 1)
        rev_k = rev_rgb.reshape(k, b, h, w, 3)
        f1s_k = jax.vmap(lambda p: f1_sweep(p, mask)[1])(pred_k)      # (k, 9)
        psnr_b_k = jax.vmap(lambda r: psnr255_int(img, r))(rev_k)     # (k,)
        # pooled sweep over every attacked copy (the offline-F1 protocol
        # scores all saved masks together, calculate_f1.py:52-72)
        _, f1s = f1_sweep(pred_mask, jnp.tile(mask, (k, 1, 1, 1)))
        return {"psnr_forward": psnr255_int(img, fwd_rgb),
                "psnr_backward": jnp.mean(psnr_b_k),
                "psnr_backward_per_attack": psnr_b_k,
                "ssim_forward": ssim(fwd_rgb, img),
                "f1_best": jnp.max(f1s), "f1_sweep": f1s,
                "f1_per_attack": jnp.max(f1s_k, axis=-1),
                "recovered": rev_k[0], "predicted_mask": pred_k[0]}
