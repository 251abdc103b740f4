"""Adversarial-example utilities — JAX rebuilds of the reference's standalone
attack scripts (AE_methods/fgsm.py, jpegadv/attack.py:26-50 FGSM/IGSM via
foolbox, resistAE.py JPEG-resistant AEs; foolbox itself is omitted per
SURVEY.md §2.1).

All functions take a differentiable `loss_fn(image) -> scalar` (e.g. CE of a
victim classifier) and ascend its gradient.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .attacks.jpeg import diffjpeg


def fgsm(loss_fn: Callable, image, epsilon: float = 0.03):
    """Fast Gradient Sign Method (AE_methods/fgsm.py)."""
    g = jax.grad(loss_fn)(image)
    return jnp.clip(image + epsilon * jnp.sign(g), 0.0, 1.0)


def igsm(loss_fn: Callable, image, epsilon: float = 0.03,
         step_size: float = 0.005, steps: int = 10):
    """Iterative FGSM / BIM with an ε-ball projection (jpegadv/attack.py)."""
    orig = image

    def body(_, x):
        g = jax.grad(loss_fn)(x)
        x = x + step_size * jnp.sign(g)
        x = jnp.clip(x, orig - epsilon, orig + epsilon)
        return jnp.clip(x, 0.0, 1.0)

    return jax.lax.fori_loop(0, steps, body, image)


def jpeg_resistant_fgsm(loss_fn: Callable, image, epsilon: float = 0.03,
                        step_size: float = 0.005, steps: int = 10,
                        quality: int = 75):
    """JPEG-resistant iterative attack (resistAE.py:20-80): the loss is
    evaluated on the differentiably-JPEG-compressed image so the perturbation
    survives compression."""
    orig = image

    def through_jpeg(x):
        return loss_fn(diffjpeg(x, quality))

    def body(_, x):
        g = jax.grad(through_jpeg)(x)
        x = jnp.clip(x + step_size * jnp.sign(g), orig - epsilon, orig + epsilon)
        return jnp.clip(x, 0.0, 1.0)

    return jax.lax.fori_loop(0, steps, body, image)


def igsm_targeted(loss_fn: Callable, image, epsilon: float = 0.03,
                  step_size: float = 0.005, steps: int = 10):
    """Targeted IGSM (jpegadv/targeted_compress.py `my_IGSM_T`): DESCEND the
    target-class loss so the victim is pushed toward the target label."""
    orig = image

    def body(_, x):
        g = jax.grad(loss_fn)(x)
        x = x - step_size * jnp.sign(g)
        x = jnp.clip(x, orig - epsilon, orig + epsilon)
        return jnp.clip(x, 0.0, 1.0)

    return jax.lax.fori_loop(0, steps, body, image)


# ---------------------------------------------------------------- victims
# Small CNN victim classifiers — rebuilds of target_models.py Model_A/B/C
# (the jpegadv study's attacked networks). NHWC Flax; dropout omitted at
# inference (the study only runs eval-mode forwards).

import flax.linen as nn  # noqa: E402


class VictimA(nn.Module):
    """target_models.py Model_A: 5×5/s2 conv → 5×5 conv → FC128 → FC."""
    num_classes: int = 10

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(64, (5, 5), strides=(2, 2), padding="VALID")(x))
        x = nn.relu(nn.Conv(64, (5, 5), padding="VALID")(x))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(128)(x))
        return nn.Dense(self.num_classes)(x)


class VictimB(nn.Module):
    """target_models.py Model_B: 8×8 → 6×6 → 5×5 convs → FC."""
    num_classes: int = 10

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(64, (8, 8), padding="VALID")(x))
        x = nn.relu(nn.Conv(128, (6, 6), padding="VALID")(x))
        x = nn.relu(nn.Conv(128, (5, 5), padding="VALID")(x))
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.num_classes)(x)


class VictimC(nn.Module):
    """target_models.py Model_C: VGG-style 2×(conv,conv,pool) → FC200 → FC."""
    num_classes: int = 10

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(32, (3, 3), padding=1)(x))
        x = nn.relu(nn.Conv(32, (3, 3), padding=1)(x))
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = nn.relu(nn.Conv(64, (3, 3), padding=1)(x))
        x = nn.relu(nn.Conv(64, (3, 3), padding=1)(x))
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(200)(x))
        return nn.Dense(self.num_classes)(x)


VICTIMS = {"A": VictimA, "B": VictimB, "C": VictimC}
