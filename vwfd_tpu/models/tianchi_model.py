"""Tianchi forgery-segmentation trainer (models/tianchi_model.py:262-301).

Two updates per step, one jitted program:
  1. BCE(SUNet(image), mask) — the segmentation step.
  2. Robustness step: the image is pushed through the QF-banded JPEG pool
     (`combined_50`: Q∈{40..55} × {hard, soft, zonal} — tianchi_model.py:112-135)
     then gaussian blur; the net must predict a ZERO mask on it (L1 to zeros)
     — i.e. compression artifacts alone are not forgeries (:291-301).

The banded pools reuse the fused `jpeg_pool` with the band's quality list.
"""

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ..attacks import jpeg_pool
from ..attacks.blur import gaussian_blur_attack
from ..config import Config
from ..metrics import bce_loss, l1_loss, f1_sweep
from ..nets.sunet import SUNet
from .state import NetState, make_optimizer

# QF bands of the tianchi pools (tianchi_model.py:112-135)
QF_BANDS = {
    90: (80, 85, 90, 95),
    70: (60, 65, 70, 75),
    50: (40, 45, 50, 55),
    30: (20, 25, 30, 35),
    10: (10,),
}


class TianchiModel:
    def __init__(self, cfg: Config, embed_dim: int = 96, depths=(2, 2, 2, 2),
                 num_heads=(3, 6, 12, 24), window_size: int = 8,
                 robustness_band: int = 50):
        self.cfg = cfg
        tc = cfg.train
        self.net = SUNet(out_channels=1, embed_dim=embed_dim, depths=depths,
                         num_heads=num_heads, window_size=window_size,
                         apply_sigmoid=True)
        self.band = QF_BANDS[robustness_band]
        self.tx = make_optimizer(tc)

    def init_states(self, key) -> Dict[str, NetState]:
        s = self.cfg.data.gt_size
        v = self.net.init(key, jnp.zeros((1, s, s, 3), jnp.float32))
        return {"netG": NetState.create(
            self.net.apply, v["params"],
            {k: x for k, x in v.items() if k != "params"}, self.tx)}

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, states, images, masks, key):
        # `states` donated (params + opt buffers update in place); the
        # non-finite-loss guard runs in-step, so callers always rebind
        st = states["netG"]

        def seg_loss(p):
            pred = self.net.apply({"params": p, **st.variables}, images)
            return bce_loss(pred, masks), pred

        (ce, pred), grads = jax.value_and_grad(seg_loss, has_aux=True)(st.params)
        st = st.apply_gradients(grads)

        # robustness step on the compressed+blurred image, target zero mask
        processed = jnp.clip(gaussian_blur_attack(
            None, jpeg_pool(key, images, qualities=self.band)), 0.0, 1.0)
        processed = jax.lax.stop_gradient(processed)

        def zero_loss(p):
            pred1 = self.net.apply({"params": p, **st.variables}, processed)
            return l1_loss(pred1, jnp.zeros_like(masks))

        ce1, grads1 = jax.value_and_grad(zero_loss)(st.params)
        st = st.apply_gradients(grads1)

        good = jnp.isfinite(ce) & jnp.isfinite(ce1)
        new_states = jax.tree_util.tree_map(
            lambda new, old: jnp.where(good, new, old), {"netG": st}, states)
        return new_states, {"CE": ce, "CE1": ce1}

    @functools.partial(jax.jit, static_argnums=0)
    def eval_step(self, states, images, masks):
        pred = self.net.apply({"params": states["netG"].params,
                               **states["netG"].variables}, images)
        _, f1s = f1_sweep(pred, masks)
        return {"f1_best": jnp.max(f1s), "f1_sweep": f1s, "predicted": pred}
