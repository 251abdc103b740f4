"""Blur attacks: depthwise gaussian and median."""

from ..ops.filters import gaussian_blur, median_blur


def gaussian_blur_attack(key, img, kernel_size=3, sigma=2.0):
    """3×3 σ=2 depthwise gaussian (noise_layers/gaussian_blur.py)."""
    del key
    return gaussian_blur(img, kernel_size, sigma)


def median_blur_attack(key, img, kernel_size=3):
    """k=3 median filter (noise_layers/middle_filter.py via kornia MedianBlur)."""
    del key
    return median_blur(img, kernel_size)


def gf_attack(key, img, sigma=1.0, kernel_size=7):
    """Kornia-style GaussianBlur2d((7,7),(σ,σ)) wrapper — reference `GF`
    (noise_layers/gaussian_filter.py:5-13)."""
    del key
    return gaussian_blur(img, kernel_size, sigma)
