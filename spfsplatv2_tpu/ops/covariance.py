"""3D covariance construction from scales + quaternions.

TPU-native replacement for the reference's build_covariance
(reference: src/model/encoder/common/gaussians.py:33-44).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spfsplatv2_tpu.geometry.se3 import quaternion_to_matrix


def build_covariance(scale: jax.Array, rotation_wxyz: jax.Array) -> jax.Array:
    """scale (..., 3), quaternion (..., 4) -> covariance (..., 3, 3).

    Sigma = R S S^T R^T with S = diag(scale).
    """
    r = quaternion_to_matrix(rotation_wxyz)
    rs = r * scale[..., None, :]
    return rs @ jnp.swapaxes(rs, -1, -2)
