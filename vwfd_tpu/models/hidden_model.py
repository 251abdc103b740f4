"""HiDDeN trainer — reference: hidden_models/hidden.py:12-184 (`Hidden`).

One jitted step runs both updates (the reference alternates two optimizer
steps per batch):
  D step: BCE(D(cover), 1) + BCE(D(encoded.detach()), 0)
  G step: λ_adv·BCE(D(encoded), 1) + λ_enc·MSE(encoded, cover)
          + λ_dec·MSE(decoded, message)
plus the bitwise-error metric (hidden.py:105-107).

TPU notes: Adam (torch default lr 1e-3, matching hidden.py:24-25), attacks
threaded as `(key, encoded, cover) -> noised` callables so the full noise
pool stays inside the compiled step.
"""

import functools
from typing import Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp
import optax

from ..attacks import (crop_attack, cropout, dropout_mix, gaussian_noise,
                       hidden_jpeg_mask_compression)
from ..metrics import bce_with_logits, l2_loss, bitwise_message_error
from ..nets import HiddenEncoder, HiddenDecoder, HiddenDiscriminator
from .state import NetState


# The HiDDeN training noise pool — encode→noise→decode is the whole point of
# the recipe (hidden_models/encoder_decoder.py:8-29; the paper's combined-
# noise model): identity / crop(+rescale back, fixed-shape) / cropout /
# dropout / gaussian noise / JPEG zig-zag mask compression.
NOISE_POOL = (
    ("identity", lambda k, e, c: e),
    ("crop", lambda k, e, c: crop_attack(k, e, min_rate=0.55,
                                         max_rate=1.0)[0]),
    ("cropout", lambda k, e, c: cropout(k, e, c)),
    ("dropout", lambda k, e, c: dropout_mix(k, e, c)),
    ("gaussian", lambda k, e, c: gaussian_noise(k, e)),
    ("jpeg_mask", lambda k, e, c: jnp.clip(
        hidden_jpeg_mask_compression(e), 0.0, 1.0)),
)


def make_combined_noiser(weights=None):
    """Combined noiser drawing one pool member per step. `weights` (len-6,
    any positive scale) biases the draw — hard-member oversampling for the
    crop/cropout tail (uniform = the reference `Combined` selection,
    noise_layers/combined.py:15-20)."""
    fns = [f for _, f in NOISE_POOL]
    p = None
    if weights is not None:
        w = jnp.asarray(weights, jnp.float32)
        p = w / jnp.sum(w)

    def noiser(key, encoded, cover):
        k_sel, k = jax.random.split(key)
        if p is None:
            idx = jax.random.randint(k_sel, (), 0, len(fns))
        else:
            idx = jax.random.choice(k_sel, len(fns), p=p)
        return jax.lax.switch(idx,
                              [lambda e, c, f=f: f(k, e, c) for f in fns],
                              encoded, cover)

    return noiser


combined_noiser = make_combined_noiser()


class HiddenModel:
    def __init__(self, message_length=30, image_size=128,
                 encoder_channels=64, encoder_blocks=4,
                 decoder_channels=64, decoder_blocks=7,
                 discriminator_channels=64, discriminator_blocks=3,
                 adversarial_loss_weight=1e-3, encoder_loss_weight=0.7,
                 decoder_loss_weight=1.0, lr=1e-3,
                 noiser: Union[str, None, Callable] = "combined"):
        self.message_length = message_length
        self.image_size = image_size
        self.w_adv = adversarial_loss_weight
        self.w_enc = encoder_loss_weight
        self.w_dec = decoder_loss_weight
        # default = the combined pool; pass noiser=None for a no-noise
        # (identity) pipeline, or any (key, encoded, cover) -> noised callable
        self.noiser = combined_noiser if noiser == "combined" else noiser
        self.encoder = HiddenEncoder(message_length, encoder_channels,
                                     encoder_blocks)
        self.decoder = HiddenDecoder(message_length, decoder_channels,
                                     decoder_blocks)
        self.discriminator = HiddenDiscriminator(discriminator_channels,
                                                 discriminator_blocks)
        self.tx = optax.adam(lr)

    def init_states(self, key) -> Dict[str, NetState]:
        s = self.image_size
        k1, k2, k3 = jax.random.split(key, 3)
        img = jnp.zeros((1, s, s, 3))
        msg = jnp.zeros((1, self.message_length))
        ev = self.encoder.init(k1, img, msg)
        dv = self.decoder.init(k2, img)
        cv = self.discriminator.init(k3, img)

        def mk(apply_fn, v):
            return NetState.create(apply_fn, v["params"],
                                   {k: x for k, x in v.items() if k != "params"},
                                   self.tx)
        return {"encoder": mk(self.encoder.apply, ev),
                "decoder": mk(self.decoder.apply, dv),
                "discriminator": mk(self.discriminator.apply, cv)}

    def _encode_decode(self, params, states, images, messages, key):
        enc, enc_vars = self.encoder.apply(
            {"params": params["encoder"], **states["encoder"].variables},
            images, messages, train=True, mutable=["batch_stats"])
        noised = enc if self.noiser is None else self.noiser(key, enc, images)
        dec, dec_vars = self.decoder.apply(
            {"params": params["decoder"], **states["decoder"].variables},
            noised, train=True, mutable=["batch_stats"])
        return enc, noised, dec, enc_vars, dec_vars

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, states, images, messages, key):
        # `states` donated; non-finite-loss guard in-step — callers rebind
        k_noise, _ = jax.random.split(key)

        # ---- discriminator step (on detached encoded images) ----
        def d_loss_fn(d_params):
            enc, *_ = self._encode_decode(
                {"encoder": states["encoder"].params,
                 "decoder": states["decoder"].params},
                states, images, messages, k_noise)
            enc = jax.lax.stop_gradient(enc)
            dvars = {"params": d_params, **states["discriminator"].variables}
            d_cover, dv1 = self.discriminator.apply(
                dvars, images, train=True, mutable=["batch_stats"])
            d_enc, dv2 = self.discriminator.apply(
                {"params": d_params, **dv1}, enc, train=True,
                mutable=["batch_stats"])
            loss_cover = bce_with_logits(d_cover, jnp.ones_like(d_cover))
            loss_enc = bce_with_logits(d_enc, jnp.zeros_like(d_enc))
            return loss_cover + loss_enc, (loss_cover, loss_enc, dv2)

        (d_total, (d_on_cover, d_on_encoded, d_vars)), d_grads = \
            jax.value_and_grad(d_loss_fn, has_aux=True)(
                states["discriminator"].params)
        new_disc = states["discriminator"].apply_gradients(d_grads).replace(
            variables=d_vars)

        # ---- generator (encoder-decoder) step ----
        def g_loss_fn(g_params):
            enc, noised, dec, enc_vars, dec_vars = self._encode_decode(
                g_params, states, images, messages, k_noise)
            d_on_enc = self.discriminator.apply(
                {"params": new_disc.params, **new_disc.variables}, enc,
                train=False)
            g_adv = bce_with_logits(d_on_enc, jnp.ones_like(d_on_enc))
            g_enc = l2_loss(enc, images)
            g_dec = l2_loss(dec, messages)
            loss = self.w_adv * g_adv + self.w_enc * g_enc + self.w_dec * g_dec
            return loss, (g_adv, g_enc, g_dec, dec, enc_vars, dec_vars)

        g_params = {"encoder": states["encoder"].params,
                    "decoder": states["decoder"].params}
        (g_total, (g_adv, g_enc, g_dec, dec, enc_vars, dec_vars)), g_grads = \
            jax.value_and_grad(g_loss_fn, has_aux=True)(g_params)

        new_states = {
            "encoder": states["encoder"].apply_gradients(
                g_grads["encoder"]).replace(variables=enc_vars),
            "decoder": states["decoder"].apply_gradients(
                g_grads["decoder"]).replace(variables=dec_vars),
            "discriminator": new_disc,
        }
        good = jnp.isfinite(g_total) & jnp.isfinite(d_total)
        new_states = jax.tree_util.tree_map(
            lambda new, old: jnp.where(good, new, old), new_states, states)
        logs = {
            "loss": g_total, "encoder_mse": g_enc, "dec_mse": g_dec,
            "bitwise_error": bitwise_message_error(dec, messages),
            "adversarial_bce": g_adv,
            "discr_cover_bce": d_on_cover, "discr_encod_bce": d_on_encoded,
        }
        return new_states, logs

    @functools.partial(jax.jit, static_argnums=0)
    def infer(self, states, images, messages, key):
        """encode → noise → decode (eval mode)."""
        enc = self.encoder.apply(
            {"params": states["encoder"].params, **states["encoder"].variables},
            images, messages, train=False)
        noised = enc if self.noiser is None else self.noiser(key, enc, images)
        dec = self.decoder.apply(
            {"params": states["decoder"].params, **states["decoder"].variables},
            noised, train=False)
        return enc, noised, dec
