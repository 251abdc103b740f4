"""KD-JPEG trainer — the RHI JPEG-simulator family (models/IRNrhi_model.py).

A batch carries the same images pre-compressed at 6 quality levels (the
LQ dataset, data/LQ_dataset.py) with per-sample QF labels. Per step
(IRNrhi_model.py:425-527):
  1. QF-classifier step: CE(localizer(real_jpeg_batch), qf_label), its own
     AdamW update (:452-462).
  2. Simulator step: FBCNN generates JPEG conditioned on label/5; loss =
     L1(simulated, real_jpeg) + 5·L1(bayar(simulated), bayar(real).detach())
     + 0.01·CE(QF(simulated), label) + 0.01·BCE GAN vs discriminator
     (:464-530).
  3. Discriminator step: real vs simulated BCE (:489-504).
All three updates run in one jitted program.
"""

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..metrics import l1_loss, bce_loss, psnr255_int
from ..nets import FBCNN, QFPredictor, Discriminator
from .state import NetState, make_optimizer


def _ce(logits, labels):
    return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
        logits, labels.astype(jnp.int32)))


class KDJpegModel:
    def __init__(self, cfg: Config, qf_classes: int = 6, size=None,
                 nc=(32, 64, 128, 256), nb=4, disc_dim=32):
        self.cfg = cfg
        self.size = size or cfg.data.gt_size
        self.qf_classes = qf_classes
        tc = cfg.train
        self.generator = FBCNN(nc=nc, nb=nb)           # JPEG simulator
        self.localizer = QFPredictor(nc=nc, nb=1, classes=qf_classes)
        self.discriminator = Discriminator(dim=disc_dim, use_sigmoid=True)
        self.tx = make_optimizer(tc)

    def init_states(self, key) -> Dict[str, NetState]:
        s = self.size
        ks = jax.random.split(key, 3)
        img = jnp.zeros((1, s, s, 3), jnp.float32)
        qf = jnp.zeros((1, 1), jnp.float32)

        def mk(apply_fn, v):
            return NetState.create(apply_fn, v["params"],
                                   {k: x for k, x in v.items() if k != "params"},
                                   self.tx)
        return {
            "generator": mk(self.generator.apply,
                            self.generator.init(ks[0], img, qf)),
            "localizer": mk(self.localizer.apply,
                            self.localizer.init(ks[1], img)),
            "discriminator": mk(self.discriminator.apply,
                                self.discriminator.init(ks[2], img)),
        }

    @staticmethod
    def collate(versions, labels, qf_classes: int = 6):
        """Flatten an LQJpegDataset batch ((B, Q+1, H, W, C), (B, Q+1)) into
        the CLASS-MAJOR layout `train_step` requires: entry c·B+i is class c
        of item i, so `real_jpeg[:B]` are the clean sources and labels read
        [0]·B, [1]·B, … Validates the invariant instead of assuming it
        (the reference assumes dataset ordering silently,
        IRNrhi_model.py:468-471)."""
        b, q1 = labels.shape
        if q1 != qf_classes:
            raise ValueError(
                f"batch carries {q1} quality classes, model expects "
                f"{qf_classes} (LQJpegDataset qualities + clean)")
        flat = versions.transpose(1, 0, 2, 3, 4).reshape(
            (q1 * b,) + versions.shape[2:])
        lab = labels.T.reshape(-1)
        import numpy as _np
        expect = _np.repeat(_np.arange(q1), b)
        if not _np.array_equal(_np.asarray(lab), expect):
            raise ValueError(
                "LQ batch labels are not class-major [0]*B,[1]*B,…: "
                f"got {lab[:3 * b]}…")
        return flat, lab

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, states, real_jpeg, labels, key, aux_ramp=1.0):
        """real_jpeg: (6B, H, W, 3) images pre-compressed at per-sample QF in
        CLASS-MAJOR order (use `KDJpegModel.collate`); labels: (6B,) integer
        QF class. The first B entries are the clean sources replicated for
        simulation (IRNrhi_model.py:468-471).

        `aux_ramp` ∈ [0,1] scales the feature/CE/GAN generator terms —
        1.0 is the reference weighting (IRNrhi_model.py:452-527); callers
        may ramp it in when the QF classifier converges orders of magnitude
        faster than the reference's real-data regime (the synthetic family
        saturates it in ~300 steps, making its CE landscape adversarially
        sharp before the simulator has learned anything).

        `states` is donated; the non-finite-loss guard runs in-step across
        all three updates, so callers always rebind."""
        del key
        b6 = real_jpeg.shape[0]
        if b6 % self.qf_classes != 0:
            raise ValueError(
                f"batch of {b6} is not divisible by qf_classes="
                f"{self.qf_classes}; pass a class-major LQ batch (collate())")
        b = b6 // self.qf_classes

        # ---- 1. QF classifier step
        def qf_loss_fn(p):
            bayar, logits = self.localizer.apply(
                {"params": p, **states["localizer"].variables}, real_jpeg)
            return _ce(logits, labels), bayar

        (l_qf, bayar_ori), qf_grads = jax.value_and_grad(
            qf_loss_fn, has_aux=True)(states["localizer"].params)
        new_loc = states["localizer"].apply_gradients(qf_grads)
        bayar_ori = jax.lax.stop_gradient(bayar_ori)

        # ---- simulate with the *updated* classifier frozen
        qf_input = (labels.astype(jnp.float32) / float(self.qf_classes - 1))[:, None]
        sim_src = jnp.tile(real_jpeg[:b], (self.qf_classes, 1, 1, 1))

        def sim(gen_params):
            out, _ = self.generator.apply(
                {"params": gen_params, **states["generator"].variables},
                sim_src, qf_input)
            # clamp WITH pass-through gradient: a hard clip zero-grads every
            # out-of-range pixel, and the first r5 run froze exactly there —
            # early CE/GAN gradients pushed the generator negative, the
            # clipped L1 then had no gradient left and l_simul pinned at
            # ~0.51 (output ≡ 0 vs mean-0.5 targets) for 1000+ steps
            # (runs/conv_r5_kdjpeg_rawbayar.jsonl). Same device-side trick
            # the reference uses on images (clamp_with_grad,
            # IRNcrop_model.py:344).
            from ..ops.quantize import clamp_with_grad
            return clamp_with_grad(out)

        # ---- 2. discriminator step (on detached simulation)
        simulated_detached = jax.lax.stop_gradient(sim(states["generator"].params))

        def d_loss_fn(p):
            d_real, dv = self.discriminator.apply(
                {"params": p, **states["discriminator"].variables}, real_jpeg,
                update_sn=True, mutable=["spectral"])
            d_fake, dv = self.discriminator.apply(
                {"params": p, **dv}, simulated_detached,
                update_sn=True, mutable=["spectral"])
            loss = 0.5 * (bce_loss(d_real, jnp.ones_like(d_real)) +
                          bce_loss(d_fake, jnp.zeros_like(d_fake)))
            return loss, dv

        (dis_loss, d_vars), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(states["discriminator"].params)
        new_disc = states["discriminator"].apply_gradients(d_grads).replace(
            variables=d_vars)

        # ---- 3. simulator (generator) step
        def g_loss_fn(gen_params):
            simulated = sim(gen_params)
            l_simul = l1_loss(simulated, real_jpeg)
            bayar_sim, qf_sim = self.localizer.apply(
                {"params": new_loc.params, **new_loc.variables}, simulated)
            # Scale-normalized Bayar feature matching. The reference's raw
            # 5·L1(bayar(sim), bayar(real)) (IRNrhi_model.py:464-530) assumes
            # the classifier's feature scale stays bounded by slow real-data
            # training; on the synthetic family the QF classifier overfits in
            # ~500 steps and its feature magnitudes inflate ~50× (measured
            # l_simul_bayar 2.6 → 116 in the r5 run), swamping the pixel
            # loss. Dividing by the detached target magnitude keeps the
            # term's RELATIVE matching objective with a stable weight.
            l_bayar = l1_loss(bayar_sim, bayar_ori) / (
                1e-3 + jax.lax.stop_gradient(jnp.mean(jnp.abs(bayar_ori))))
            l_qf_sim = _ce(qf_sim, labels)
            g_fake = self.discriminator.apply(
                {"params": new_disc.params, **new_disc.variables}, simulated)
            fw_gan = bce_loss(g_fake, jnp.ones_like(g_fake))
            loss = l_simul + aux_ramp * (
                5.0 * l_bayar + 0.01 * l_qf_sim + 0.01 * fw_gan)
            return loss, (l_simul, l_bayar, l_qf_sim, fw_gan, simulated)

        (g_total, (l_simul, l_bayar, l_qf_sim, fw_gan, simulated)), g_grads = \
            jax.value_and_grad(g_loss_fn, has_aux=True)(
                states["generator"].params)
        new_gen = states["generator"].apply_gradients(g_grads)

        new_states = {"generator": new_gen, "localizer": new_loc,
                      "discriminator": new_disc}
        good = (jnp.isfinite(l_qf) & jnp.isfinite(dis_loss)
                & jnp.isfinite(g_total))
        new_states = jax.tree_util.tree_map(
            lambda new, old: jnp.where(good, new, old), new_states, states)
        logs = {"lQF": l_qf, "l_simul": l_simul, "l_simul_bayar": l_bayar,
                "qfsimu": l_qf_sim, "FW_GAN": fw_gan, "dis_loss": dis_loss,
                "PSSIMU": psnr255_int(simulated, real_jpeg)}
        return new_states, logs

    @functools.partial(jax.jit, static_argnums=0)
    def simulate(self, states, images, qf01):
        """Simulate JPEG at normalized quality `qf01` ∈ [0,1], (B,1)."""
        out, _ = self.generator.apply(
            {"params": states["generator"].params,
             **states["generator"].variables}, images, qf01)
        return jnp.clip(out, 0.0, 1.0)
