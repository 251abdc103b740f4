"""Quantization / rounding primitives with the reference's exact gradients.

Gradients match the PyTorch originals because `jnp.round` (like `torch.round`)
carries zero gradient, and straight-through estimators are built with
`stop_gradient` exactly where the reference used `.detach()` / autograd.Function.
"""

import jax
import jax.numpy as jnp


def ste_quantize_255(x):
    """8-bit straight-through quantizer: fwd `round(x·255)/255`, bwd identity.

    Reference: models/modules/Quantization.py:4-21 (`Quant` autograd.Function).
    """
    return x + jax.lax.stop_gradient(jnp.round(x * 255.0) / 255.0 - x)


def clamp_with_grad(x, lo=0.0, hi=1.0):
    """Clamp in the forward pass, identity gradient in the backward pass.

    Reference: models/IRNcrop_model.py:320-322.
    """
    return x + jax.lax.stop_gradient(jnp.clip(x, lo, hi) - x)


def diff_round(x):
    """`round(x) + (x - round(x))^3` — grad 3(x-round(x))² (utils/JPEG.py:472-479)."""
    r = jnp.round(x)
    return r + (x - r) ** 3


def round_only_at_0(x):
    """`x³` where |x|<0.5 else `x` (utils/JPEG.py:482-484; jpeg.py:255-257 round_ss)."""
    return jnp.where(jnp.abs(x) < 0.5, x ** 3, x)


def jpeg_scale_factor(quality: float) -> float:
    """Std JPEG table scale: Q≥50 → 2−0.02Q else 50/Q (noise_layers/jpeg.py:221)."""
    return 2.0 - quality * 0.02 if quality >= 50 else 50.0 / quality


def quality_to_factor(quality: float) -> float:
    """DiffJPEG variant of the same mapping (utils/JPEG.py:487-498)."""
    q = 5000.0 / quality if quality < 50 else 200.0 - quality * 2.0
    return q / 100.0
