"""Camera projection / ray library (pure JAX, batched, differentiable).

TPU-native replacement for the reference's torch ray/projection library
(reference: src/geometry/projection.py). Intrinsics are NORMALIZED (pixel
coordinates divided by image size) unless stated otherwise; extrinsics are
camera-to-world 4x4.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def homogenize_points(p: jax.Array) -> jax.Array:
    return jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)


def homogenize_vectors(v: jax.Array) -> jax.Array:
    return jnp.concatenate([v, jnp.zeros_like(v[..., :1])], axis=-1)


def transform_rigid(xyzw: jax.Array, transform: jax.Array) -> jax.Array:
    return jnp.einsum("...ij,...j->...i", transform, xyzw)


def transform_cam2world(xyzw: jax.Array, c2w: jax.Array) -> jax.Array:
    return transform_rigid(xyzw, c2w)


def transform_world2cam(xyzw: jax.Array, c2w: jax.Array) -> jax.Array:
    from spfsplatv2_tpu.geometry.se3 import inverse_se3

    return transform_rigid(xyzw, inverse_se3(c2w))


def project(points: jax.Array, intrinsics: jax.Array, eps: float = 1e-8):
    """Camera-space points -> (normalized image xy, in-front-of-camera mask)."""
    z = points[..., -1:]
    xy_h = jnp.einsum("...ij,...j->...i", intrinsics, points / jnp.where(
        jnp.abs(z) < eps, eps, z))
    return xy_h[..., :2], points[..., -1] > eps


def unproject(coordinates: jax.Array, z: jax.Array, intrinsics: jax.Array) -> jax.Array:
    """Normalized image coords + depth -> camera-space points."""
    k_inv = jnp.linalg.inv(intrinsics)
    rays = jnp.einsum(
        "...ij,...j->...i", k_inv, homogenize_points(coordinates)
    )
    return rays * z[..., None]


def get_world_rays(
    coordinates: jax.Array, extrinsics: jax.Array, intrinsics: jax.Array
):
    """Pixel-grid coords -> (world origins, unit world directions).

    Reference: src/geometry/projection.py:96-122.
    """
    directions = unproject(coordinates, jnp.ones_like(coordinates[..., 0]), intrinsics)
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    directions = jnp.einsum(
        "...ij,...j->...i", extrinsics[..., :3, :3], directions
    )
    origins = jnp.broadcast_to(extrinsics[..., :3, 3], directions.shape)
    return origins, directions


def sample_image_grid(shape: tuple[int, int], dtype=jnp.float32):
    """Pixel-center coordinates for an image.

    Returns (coordinates (h, w, 2) xy in [0, 1], indices (h, w, 2) ij ints).
    Reference: src/geometry/projection.py:153-173.
    """
    h, w = shape
    row = jnp.arange(h)
    col = jnp.arange(w)
    indices = jnp.stack(jnp.meshgrid(row, col, indexing="ij"), axis=-1)
    y = (row.astype(dtype) + 0.5) / h
    x = (col.astype(dtype) + 0.5) / w
    coords = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)
    return coords, indices


def get_fov(intrinsics: jax.Array) -> jax.Array:
    """Horizontal/vertical FOV (radians) from normalized intrinsics.

    Returns (..., 2) = (fov_x, fov_y). Reference: src/geometry/projection.py:269-283.
    """
    k_inv = jnp.linalg.inv(intrinsics)

    def ray(v):
        vec = jnp.einsum("...ij,j->...i", k_inv, jnp.asarray(v, dtype=intrinsics.dtype))
        return vec / jnp.linalg.norm(vec, axis=-1, keepdims=True)

    left, right = ray([0.0, 0.5, 1.0]), ray([1.0, 0.5, 1.0])
    top, bottom = ray([0.5, 0.0, 1.0]), ray([0.5, 1.0, 1.0])
    fov_x = jnp.arccos(jnp.clip(jnp.sum(left * right, axis=-1), -1.0, 1.0))
    fov_y = jnp.arccos(jnp.clip(jnp.sum(top * bottom, axis=-1), -1.0, 1.0))
    return jnp.stack([fov_x, fov_y], axis=-1)


def unnormalize_intrinsics(intrinsics: jax.Array, image_shape: tuple[int, int]) -> jax.Array:
    """Normalized -> pixel-unit intrinsics for (h, w) images."""
    h, w = image_shape
    scale = jnp.asarray(
        [[w, w, w], [h, h, h], [1, 1, 1]], dtype=intrinsics.dtype
    )
    row_scale = jnp.asarray([w, h, 1], dtype=intrinsics.dtype)[..., :, None]
    del scale
    return intrinsics * row_scale


def normalize_intrinsics(intrinsics: jax.Array, image_shape: tuple[int, int]) -> jax.Array:
    h, w = image_shape
    row_scale = jnp.asarray([1.0 / w, 1.0 / h, 1.0], dtype=intrinsics.dtype)[..., :, None]
    return intrinsics * row_scale


def intersect_rays(
    origins_a: jax.Array,
    directions_a: jax.Array,
    origins_b: jax.Array,
    directions_b: jax.Array,
    eps: float = 1e-10,
) -> jax.Array:
    """Least-squares intersection point of ray pairs (..., 3).

    Parallel rays map to +inf. Reference: src/geometry/projection.py:212-266.
    """
    da = directions_a / jnp.linalg.norm(directions_a, axis=-1, keepdims=True)
    db = directions_b / jnp.linalg.norm(directions_b, axis=-1, keepdims=True)
    parallel = jnp.abs(jnp.sum(da * db, axis=-1)) >= 1 - eps

    eye = jnp.eye(3, dtype=da.dtype)
    pa = eye - da[..., :, None] * da[..., None, :]
    pb = eye - db[..., :, None] * db[..., None, :]
    lhs = pa + pb
    rhs = (pa @ origins_a[..., None] + pb @ origins_b[..., None])[..., 0]
    sol = jnp.linalg.solve(
        lhs + 1e-8 * eye, rhs[..., None]
    )[..., 0]
    return jnp.where(parallel[..., None], jnp.inf, sol)
