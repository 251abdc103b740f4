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
