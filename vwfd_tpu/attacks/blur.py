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
