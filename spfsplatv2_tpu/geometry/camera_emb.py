"""Camera-aware pixel embeddings (SH-of-ray, sinusoidal, Plucker).

TPU-native port of the reference camera embeddings
(reference: src/geometry/camera_emb.py:9-80, with the cartesian SH basis
from src/misc/sht.py replaced by ops/sh.sh_basis). Used by the
`intrinsics_embed_type: pixelwise` backbone variants.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from spfsplatv2_tpu.geometry.projection import (
    get_world_rays,
    sample_image_grid,
    unproject,
)
from spfsplatv2_tpu.ops.sh import sh_basis


def _local_ray_dirs(intrinsics: jax.Array, hw: tuple[int, int]) -> jax.Array:
    """(..., 3, 3) normalized intrinsics -> unit camera rays (..., h, w, 3)."""
    h, w = hw
    coords, _ = sample_image_grid((h, w))
    dirs = unproject(
        coords, jnp.ones(coords.shape[:-1]), intrinsics[..., None, None, :, :]
    )
    return dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)


def get_intrinsic_embedding(
    intrinsics: jax.Array, hw: tuple[int, int], degree: int = 0
) -> jax.Array:
    """Pixelwise SH-of-ray-direction embed (..., h, w, (degree+1)^2 or 3)."""
    dirs = _local_ray_dirs(intrinsics, hw)
    if degree == 0:
        return dirs
    return sh_basis(dirs, degree)


def get_intrinsic_positional_embedding(
    intrinsics: jax.Array, hw: tuple[int, int], d_model: int
) -> jax.Array:
    """Sinusoidal PE of the camera-plane (x, y) ray coords (..., h, w, d)."""
    h, w = hw
    coords, _ = sample_image_grid((h, w))
    xy = unproject(
        coords, jnp.ones(coords.shape[:-1]), intrinsics[..., None, None, :, :]
    )[..., :2]
    half = d_model // 2
    div = jnp.exp(
        jnp.arange(0, half, 2, dtype=jnp.float32) * (-math.log(10000.0) / half)
    )
    x = xy[..., 0:1] * div
    y = xy[..., 1:2] * div
    pe = jnp.zeros((*xy.shape[:-1], d_model), xy.dtype)
    pe = pe.at[..., 0::4].set(jnp.sin(x))
    pe = pe.at[..., 1::4].set(jnp.cos(x))
    pe = pe.at[..., 2::4].set(jnp.sin(y))
    pe = pe.at[..., 3::4].set(jnp.cos(y))
    return pe


def get_plucker_embedding(
    extrinsics: jax.Array, intrinsics: jax.Array, hw: tuple[int, int]
) -> jax.Array:
    """Plucker ray embed (..., h, w, 6) = [o x d | d]."""
    h, w = hw
    coords, _ = sample_image_grid((h, w))
    origins, dirs = get_world_rays(
        coords,
        extrinsics[..., None, None, :, :],
        intrinsics[..., None, None, :, :],
    )
    return jnp.concatenate([jnp.cross(origins, dirs), dirs], axis=-1)
