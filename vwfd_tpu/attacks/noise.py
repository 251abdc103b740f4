"""Pixel-noise attacks: additive gaussian, salt & pepper, pixel dropout, identity."""

import jax
import jax.numpy as jnp


def identity(key, img):
    """Pass-through (noise_layers/identity.py)."""
    del key
    return img


def gaussian_noise(key, img, mean=0.0, stddev=0.05, clip=True):
    """Additive N(mean, stddev²) + clamp (noise_layers/gaussian.py:4-17)."""
    out = img + mean + stddev * jax.random.normal(key, img.shape, img.dtype)
    return jnp.clip(out, 0.0, 1.0) if clip else out


def salt_pepper(key, img, prob=0.01):
    """Threshold uniform noise to 0/1 pixels (noise_layers/salt_pepper_noise.py)."""
    rdn = jax.random.uniform(key, img.shape)
    out = jnp.where(rdn > 1.0 - prob / 2.0, jnp.zeros_like(img), img)
    return jnp.where(rdn < prob / 2.0, jnp.ones_like(out), out)


def dropout_pixelwise(key, img, cover, prob=0.5):
    """Bernoulli per-element mix with cover (noise_layers/crop.py Dropout:136-147)."""
    rdn = jax.random.uniform(key, img.shape)
    return jnp.where(rdn > prob, cover, img)
