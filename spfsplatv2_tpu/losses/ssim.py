"""Gaussian-window SSIM (metric-grade), pure JAX.

TPU-native replacement for the reference's SSIM library
(reference: src/loss/loss_ssim.py:129-274 and the skimage-based eval metric
src/evaluation/metrics.py:36-52). Uses the standard 11x11 sigma-1.5 Gaussian
window with data_range=1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def _filter2d(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise 'valid' convolution of (b, h, w, c) with (k, k)."""
    c = img.shape[-1]
    k = kernel[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        img, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def ssim(
    a: jax.Array,
    b: jax.Array,
    data_range: float = 1.0,
    size: int = 11,
    sigma: float = 1.5,
) -> jax.Array:
    """Mean SSIM per batch element. a, b: (batch, h, w, c) in [0, data_range]."""
    kernel = jnp.asarray(_gaussian_kernel(size, sigma))
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    mu_a = _filter2d(a, kernel)
    mu_b = _filter2d(b, kernel)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sigma_a = _filter2d(a * a, kernel) - mu_aa
    sigma_b = _filter2d(b * b, kernel) - mu_bb
    sigma_ab = _filter2d(a * b, kernel) - mu_ab

    num = (2 * mu_ab + c1) * (2 * sigma_ab + c2)
    den = (mu_aa + mu_bb + c1) * (sigma_a + sigma_b + c2)
    return jnp.mean(num / den, axis=(1, 2, 3))
