"""Attack composition: random member selection + the flagship video pool."""

import jax
import jax.numpy as jnp

from .jpeg import jpeg_pool, jpeg_pool_pair
from .spatial import resize_roundtrip
from .blur import gaussian_blur_attack, median_blur_attack

ATTACK_POOL_SIZE = 5  # resize, jpeg_strong, jpeg_weak, median, gaussian-blur


def combined_switch(key, img, attack_fns):
    """Uniform random member selection (noise_layers/combined.py:15-20).

    Use only for *structurally different* attacks; JPEG-family pools should go
    through `jpeg_pool`, which folds selection into traced parameters instead
    of `lax.switch` branch fan-out.
    """
    k_sel, k_atk = jax.random.split(key)
    idx = jax.random.randint(k_sel, (), 0, len(attack_fns))
    return jax.lax.switch(idx, [lambda im, f=f: f(k_atk, im) for f in attack_fns], img)


def attack_pool_video(key, video, ratios=None):
    """The IRNcrop 5-way per-frame hybrid attack (models/IRNcrop_model.py:350-373),
    fused and vmapped over frames.

    video: (B, T, H, W, C) in [0,1]. Per (batch, frame): compute the five
    attacked variants and mix them with softmax(α), α ~ N(0,1)⁵ — the
    *intended* semantics of the reference loop. (The reference as committed
    sums the softmax weights without multiplying the attacked images —
    IRNcrop_model.py:368-369 — a train-step bug SURVEY.md §0 says not to copy.)

    Both combined_jpeg_strong and combined_jpeg_weak are the same 15-member
    pool in the reference (models/IRNcrop_model.py:98-103); they appear as two
    independent draws here too.
    """
    b, t = video.shape[0], video.shape[1]

    def per_frame(k, frame):
        ks = jax.random.split(k, 4)
        alpha = jax.nn.softmax(jax.random.normal(ks[3], (ATTACK_POOL_SIZE,)))
        prec = jax.lax.Precision.DEFAULT  # attack path: bf16 MXU passes
        a0 = (resize_roundtrip(ks[0], frame, precision=prec) if ratios is None
              else resize_roundtrip(ks[0], frame, ratios=ratios,
                                    precision=prec))
        # "strong" + "weak" pool draws, fused: one DCT/IDCT, coefficients
        # mixed by (α1, α2) — exactly α1·jpeg₁ + α2·jpeg₂ (see jpeg_pool_pair)
        a_jpeg = jpeg_pool_pair(ks[1], ks[2], frame, alpha[1], alpha[2])
        a3 = median_blur_attack(None, frame)
        a4 = gaussian_blur_attack(None, frame)
        return alpha[0] * a0 + a_jpeg + alpha[3] * a3 + alpha[4] * a4

    keys = jax.random.split(key, b * t).reshape(b, t, 2)
    flat = video.reshape((b * t,) + video.shape[2:])
    out = jax.vmap(per_frame)(keys.reshape(b * t, 2), flat)
    return out.reshape(video.shape)
