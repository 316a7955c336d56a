"""3D covariance construction from scales + quaternions.

TPU-native replacement for the reference's build_covariance
(reference: src/model/encoder/common/gaussians.py:33-44).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def build_covariance(scale: jax.Array, rotation_wxyz: jax.Array) -> jax.Array:
    """scale (..., 3), quaternion (..., 4) -> covariance (..., 3, 3).

    Sigma = R S S^T R^T with S = diag(scale).

    Unrolled over the 3x3 components (no dot_general): a batched tiny-dim
    matmul makes XLA lay the temporaries out with the (3, 3) axes minor
    and (8, 128)-tile them — 56.9x padding, ~12 GB of HBM temps at the
    flagship b=16 batch (the round-4 train-bench OOM).  Elementwise
    component math keeps the big axis minor and the layout dense.
    """
    q = rotation_wxyz / (
        jnp.linalg.norm(rotation_wxyz, axis=-1, keepdims=True) + 1e-8
    )
    qw, qx, qy, qz = jnp.moveaxis(q, -1, 0)
    # Rotation components (matching se3.quaternion_to_matrix).
    r = [
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz),
         2 * (qx * qz + qw * qy)],
        [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz),
         2 * (qy * qz - qw * qx)],
        [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx),
         1 - 2 * (qx * qx + qy * qy)],
    ]
    s2 = [scale[..., k] * scale[..., k] for k in range(3)]
    # Sigma[i][j] = sum_k R[i][k] s_k^2 R[j][k]  (symmetric: 6 uniques).
    rows = []
    for i in range(3):
        row = []
        for j in range(3):
            if j < i:
                row.append(rows[j][i])
            else:
                row.append(sum(r[i][k] * s2[k] * r[j][k] for k in range(3)))
        rows.append(row)
    flat = jnp.stack([rows[i][j] for i in range(3) for j in range(3)], axis=-1)
    return flat.reshape(*scale.shape[:-1], 3, 3)
