"""MBRS trainer — JPEG-robust watermarking with the mini-batch-of-real-and-
simulated-JPEG recipe the MBRS method is named for (reference vendors the
nets at mbrs_models/; IRNcrop uses its Encoder_MP/Decoder as baselines,
models/IRNcrop_model.py:24,41).

Per step, the noise layer is drawn per-sample from {identity, real-JPEG
(non-differentiable, straight-through), simulated JPEG (differentiable)} —
here realised as {identity, jpeg_basic with hard rounding under STE,
jpeg_basic with soft rounding}, all inside one compiled step via traced
selection weights.
"""

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import optax

from ..attacks.jpeg import jpeg_basic
from ..metrics import l2_loss, bitwise_message_error
from ..nets import MBRSEncoder, MBRSDecoder
from .state import NetState


def _mbrs_noise(key, enc, qualities=(50, 70, 90)):
    """Per-batch draw of {identity | STE real-ish JPEG | soft JPEG}."""
    k1, k2 = jax.random.split(key)
    qs = jnp.asarray(qualities, dtype=jnp.float32)
    q = qs[jax.random.randint(k1, (), 0, len(qualities))]
    scale = jnp.where(q >= 50, 2.0 - q * 0.02, 50.0 / q)
    mode = jax.random.randint(k2, (), 0, 3)
    hard = jpeg_basic(enc, scale_factor=scale, rounding="round")
    hard = enc + jax.lax.stop_gradient(hard - enc)  # straight-through
    soft = jpeg_basic(enc, scale_factor=scale, rounding="ss")
    return jnp.where(mode == 0, enc, jnp.where(mode == 1, hard, soft))


class MBRSModel:
    def __init__(self, image_size=128, message_length=30, channels=64,
                 blocks=4, diffusion_length=256, lr=1e-3,
                 w_enc=0.7, w_msg=10.0):
        self.image_size = image_size
        self.message_length = message_length
        self.w_enc = w_enc
        self.w_msg = w_msg
        self.encoder = MBRSEncoder(height=image_size,
                                   message_length=message_length,
                                   channels=channels, blocks=blocks,
                                   diffusion_length=diffusion_length)
        self.decoder = MBRSDecoder(height=image_size,
                                   message_length=message_length,
                                   channels=channels,
                                   diffusion_length=diffusion_length)
        self.tx = optax.adam(lr)

    def init_states(self, key) -> Dict[str, NetState]:
        s = self.image_size
        k1, k2 = jax.random.split(key)
        img = jnp.zeros((1, s, s, 3))
        msg = jnp.zeros((1, self.message_length))
        ev = self.encoder.init(k1, img, msg)
        dv = self.decoder.init(k2, img)

        def mk(apply_fn, v):
            return NetState.create(apply_fn, v["params"],
                                   {k: x for k, x in v.items() if k != "params"},
                                   self.tx)
        return {"encoder": mk(self.encoder.apply, ev),
                "decoder": mk(self.decoder.apply, dv)}

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, states, images, messages, key):
        # `states` donated; non-finite-loss guard in-step — callers rebind
        def loss_fn(params):
            enc, enc_vars = self.encoder.apply(
                {"params": params["encoder"], **states["encoder"].variables},
                images, messages, train=True, mutable=["batch_stats"])
            noised = _mbrs_noise(key, jnp.clip(enc, 0.0, 1.0))
            dec, dec_vars = self.decoder.apply(
                {"params": params["decoder"], **states["decoder"].variables},
                noised, train=True, mutable=["batch_stats"])
            l_enc = l2_loss(enc, images)
            l_msg = l2_loss(dec, messages)
            loss = self.w_enc * l_enc + self.w_msg * l_msg
            return loss, (l_enc, l_msg, dec, enc_vars, dec_vars)

        params = {"encoder": states["encoder"].params,
                  "decoder": states["decoder"].params}
        (loss, (l_enc, l_msg, dec, enc_vars, dec_vars)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(params)
        new_states = {
            "encoder": states["encoder"].apply_gradients(
                grads["encoder"]).replace(variables=enc_vars),
            "decoder": states["decoder"].apply_gradients(
                grads["decoder"]).replace(variables=dec_vars),
        }
        good = jnp.isfinite(loss)
        new_states = jax.tree_util.tree_map(
            lambda new, old: jnp.where(good, new, old), new_states, states)
        logs = {"loss": loss, "encoder_mse": l_enc, "message_mse": l_msg,
                "bitwise_error": bitwise_message_error(dec, messages)}
        return new_states, logs

    @functools.partial(jax.jit, static_argnums=0)
    def infer(self, states, images, messages, key):
        enc = self.encoder.apply(
            {"params": states["encoder"].params, **states["encoder"].variables},
            images, messages, train=False)
        noised = _mbrs_noise(key, jnp.clip(enc, 0.0, 1.0))
        dec = self.decoder.apply(
            {"params": states["decoder"].params, **states["decoder"].variables},
            noised, train=False)
        return enc, noised, dec
