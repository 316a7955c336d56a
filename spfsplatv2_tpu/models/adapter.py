"""Gaussian adapters: raw head channels -> world-space Gaussians.

TPU-native port of the reference adapters
(reference: src/model/encoder/common/gaussian_adapter.py:32-150):

  * `unified_gaussian_adapter` — the pose-free path: means are the predicted
    pointmaps (already world-space); scales via 0.001*softplus clamped at
    0.3; unit quaternions; SH with the per-degree damping mask
    0.1 * 0.25**degree; covariance = R S S^T R^T.
  * `map_pdf_to_opacity` — the density->opacity warmup mapping
    (reference encoder_spfsplatv2.py:146-159).

Pure functions (no parameters), fully batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from spfsplatv2_tpu.gaussians import Gaussians
from spfsplatv2_tpu.ops.covariance import build_covariance


def sh_mask(sh_degree: int) -> np.ndarray:
    """Damping mask biasing init toward the DC band (reference lines 39-48)."""
    d_sh = (sh_degree + 1) ** 2
    mask = np.ones((d_sh,), np.float32)
    for degree in range(1, sh_degree + 1):
        mask[degree**2: (degree + 1) ** 2] = 0.1 * 0.25**degree
    return mask


def map_pdf_to_opacity(
    pdf: jax.Array, global_step, initial: float = 0.0, final: float = 0.0,
    warm_up: int = 1,
) -> jax.Array:
    """Density -> opacity with an exponent warmup schedule."""
    x = initial + jnp.minimum(global_step / warm_up, 1.0) * (final - initial)
    exponent = 2.0**x
    return 0.5 * (1.0 - (1.0 - pdf) ** exponent + pdf ** (1.0 / exponent))


def unified_gaussian_adapter(
    means: jax.Array,          # (..., 3) world-space pointmap
    opacities: jax.Array,      # (...,)
    raw_gaussians: jax.Array,  # (..., 7 + 3 * d_sh)
    sh_degree: int = 4,
    eps: float = 1e-8,
) -> Gaussians:
    d_sh = (sh_degree + 1) ** 2
    scales = raw_gaussians[..., 0:3]
    rotations = raw_gaussians[..., 3:7]
    sh = raw_gaussians[..., 7: 7 + 3 * d_sh]

    scales = jnp.minimum(0.001 * jax.nn.softplus(scales), 0.3)
    rotations = rotations / (
        jnp.linalg.norm(rotations, axis=-1, keepdims=True) + eps
    )
    sh = sh.reshape(*sh.shape[:-1], 3, d_sh) * jnp.asarray(sh_mask(sh_degree))
    covariances = build_covariance(scales, rotations)

    return Gaussians(
        means=means,
        covariances=covariances,
        scales=scales,
        rotations=rotations,
        harmonics=sh,
        opacities=opacities,
    )


def raw_gaussian_channels(sh_degree: int = 4) -> int:
    """1 (opacity) + 3 (scale) + 4 (rotation) + 3 * d_sh (SH)."""
    return 1 + 7 + 3 * (sh_degree + 1) ** 2
