"""Pointmap geometry utilities (DUSt3R-heritage math, re-done in JAX).

TPU-native replacement for the reference's torch pointcloud library
(reference: src/geometry/ptc_geometry.py). Used by the distillation loss and
pose evaluation paths. All functions are batched and use masks instead of
data-dependent shapes so they stay jit-compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def geotrf(transform: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply a (..., 4, 4) rigid transform to (..., n, 3) points."""
    return (
        jnp.einsum("...ij,...nj->...ni", transform[..., :3, :3], pts)
        + transform[..., None, :3, 3]
    )


def depthmap_to_pts3d(depth: jax.Array, intrinsics_px: jax.Array) -> jax.Array:
    """Z-depth map (..., h, w) + pixel-unit intrinsics -> camera pts (..., h, w, 3).

    Reference: src/geometry/ptc_geometry.py (depthmap_to_pts3d).
    """
    h, w = depth.shape[-2:]
    u = jnp.arange(w, dtype=depth.dtype) + 0.5
    v = jnp.arange(h, dtype=depth.dtype) + 0.5
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    fx = intrinsics_px[..., 0, 0][..., None, None]
    fy = intrinsics_px[..., 1, 1][..., None, None]
    cx = intrinsics_px[..., 0, 2][..., None, None]
    cy = intrinsics_px[..., 1, 2][..., None, None]
    x = depth * (uu - cx) / fx
    y = depth * (vv - cy) / fy
    return jnp.stack([x, y, depth], axis=-1)


def normalize_pointcloud(
    pts1: jax.Array,
    pts2: jax.Array | None = None,
    norm_mode: str = "avg_dis",
    valid1: jax.Array | None = None,
    valid2: jax.Array | None = None,
):
    """Scale pointmaps by the average distance to origin over valid points.

    pts*: (b, h, w, 3); valid*: (b, h, w) bool or None.
    Only the `avg_dis` mode (the one the reference distillation loss uses) is
    implemented densely; see reference src/geometry/ptc_geometry.py:270-330.
    Returns normalized pts (and pts2 if given), plus the norm factor (b,).
    """
    mode, dis_mode = norm_mode.split("_")
    assert mode == "avg" and dis_mode == "dis", f"unsupported {norm_mode=}"

    def flat(p, valid):
        b = p.shape[0]
        x = p.reshape(b, -1, 3)
        if valid is None:
            m = jnp.ones(x.shape[:2], dtype=p.dtype)
        else:
            m = valid.reshape(b, -1).astype(p.dtype)
        return x, m

    x1, m1 = flat(pts1, valid1)
    if pts2 is not None:
        x2, m2 = flat(pts2, valid2)
        xs = jnp.concatenate([x1, x2], axis=1)
        ms = jnp.concatenate([m1, m2], axis=1)
    else:
        xs, ms = x1, m1

    dist = jnp.linalg.norm(xs, axis=-1) * ms
    norm = dist.sum(axis=1) / (ms.sum(axis=1) + 1e-8)
    norm = jnp.maximum(norm, 1e-8)

    shape = (pts1.shape[0],) + (1,) * (pts1.ndim - 1)
    out1 = pts1 / norm.reshape(shape)
    if pts2 is not None:
        return out1, pts2 / norm.reshape(shape), norm
    return out1, norm
