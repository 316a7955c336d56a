"""Focal estimation from predicted pointmaps (Weiszfeld IRLS).

TPU-native port of the reference focal solver
(reference: src/misc/intrinsics_utils.py:33-173 estimate_focal_knowing_depth
/ estimate_intrinsics): find focal f minimizing sum_i w_i
| pixel_i - f * (x_i, y_i) / z_i | with iteratively-reweighted least
squares, assuming square pixels and a centered principal point. Used when
`estimating_focal=true`. Fully vectorized/jit-compatible (masking instead
of boolean indexing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def estimate_focal_from_pointmap(
    pts3d: jax.Array, iters: int = 10, eps: float = 1e-8
) -> jax.Array:
    """pts3d (b, h, w, 3) camera-frame points -> focal (b,) in PIXELS."""
    b, h, w, _ = pts3d.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=pts3d.dtype), jnp.arange(w, dtype=pts3d.dtype),
        indexing="ij",
    )
    pixels = jnp.stack([xs - w / 2, ys - h / 2], -1).reshape(1, -1, 2)
    pts = pts3d.reshape(b, -1, 3)
    z = pts[..., 2]
    valid = (z > eps).astype(pts3d.dtype)
    xy_over_z = jnp.where(
        (jnp.abs(z) > eps)[..., None], pts[..., :2] / z[..., None], 0.0
    )

    dot_px = jnp.sum(xy_over_z * pixels, -1) * valid
    dot_xy = jnp.sum(xy_over_z**2, -1) * valid
    focal = jnp.sum(dot_px, 1) / jnp.maximum(jnp.sum(dot_xy, 1), eps)
    focal_base = max(h, w) / (2 * jnp.tan(jnp.deg2rad(30.0)))
    focal = jnp.where(focal > 0, focal, focal_base)

    def body(_, focal):
        resid = jnp.linalg.norm(
            focal[:, None, None] * xy_over_z - pixels, axis=-1
        )
        weight = valid / jnp.maximum(resid, eps)
        num = jnp.sum(weight * dot_px, 1)
        den = jnp.sum(weight * dot_xy, 1)
        return jnp.maximum(num / jnp.maximum(den, eps), eps)

    return jax.lax.fori_loop(0, iters, body, focal)


def estimate_intrinsics(pts3d: jax.Array) -> jax.Array:
    """(b, v, h, w, 3) pointmaps (view 0 used) -> normalized K (b, 3, 3).

    Reference: estimate_intrinsics (intrinsics_utils.py:162-173).
    """
    b, v, h, w, _ = pts3d.shape
    focal_px = estimate_focal_from_pointmap(pts3d[:, 0])
    fx = focal_px / w
    fy = focal_px / h
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    k = jnp.stack(
        [fx, zeros, 0.5 * ones, zeros, fy, 0.5 * ones, zeros, zeros, ones], -1
    )
    return k.reshape(b, 3, 3)
