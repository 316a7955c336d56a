"""Dense per-pixel reference compositor (the correctness oracle).

Composites ALL Gaussians against ALL pixels in exact global depth order with
the same semantics as the CUDA rasterizer's per-tile loop (front-to-back,
alpha clamp, transmittance break at 1e-4). O(pixels * gaussians) — use only
for tests and tiny scenes. The production paths (`raster_tiled`,
`raster_pallas`) must match this bit-for-bit up to reduction order.

Replaces: reference CUDA `diff_gauss_pose` forward/backward on small inputs
(backward comes for free from autodiff here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spfsplatv2_tpu.ops.raster_common import (
    ProjectedGaussians,
    T_EPS,
    alpha_from_conic,
)


def composite_reference(
    proj: ProjectedGaussians,
    image_shape: tuple[int, int],
    background: jax.Array,
):
    """Returns (color (h, w, 3), depth (h, w), alpha (h, w))."""
    h, w = image_shape
    g = proj.xy.shape[0]

    order = jnp.argsort(proj.depth)
    xy = proj.xy[order]
    conic = proj.conic[order]
    color = proj.color[order]
    opacity = proj.opacity[order]
    depth = proj.depth[order]
    live = (proj.radius[order] > 0) & jnp.isfinite(depth)

    ys = jnp.arange(h, dtype=xy.dtype)
    xs = jnp.arange(w, dtype=xy.dtype)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    pix = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)  # (p, 2)

    alpha = alpha_from_conic(xy, conic, opacity, pix)  # (p, g)
    alpha = jnp.where(live[None, :], alpha, 0.0)

    # Inclusive transmittance after compositing each gaussian.
    t_incl = jnp.cumprod(1.0 - alpha, axis=-1)  # (p, g)
    t_excl = jnp.concatenate(
        [jnp.ones_like(t_incl[..., :1]), t_incl[..., :-1]], axis=-1
    )
    # CUDA break semantics: gaussian i composited iff T_{i+1} >= 1e-4.
    composited = jax.lax.stop_gradient(t_incl) >= T_EPS
    weight = jnp.where(composited, alpha * t_excl, 0.0)

    t_final = jnp.prod(
        1.0 - jnp.where(composited, alpha, 0.0), axis=-1
    )  # (p,)

    hi = jax.lax.Precision.HIGHEST
    out_color = (
        jnp.matmul(weight, color, precision=hi)
        + t_final[:, None] * background[None, :]
    )
    depth_safe = jnp.where(jnp.isfinite(depth), depth, 0.0)
    out_depth = jnp.matmul(weight, depth_safe[:, None], precision=hi)
    out_alpha = 1.0 - t_final

    return (
        out_color.reshape(h, w, 3),
        out_depth.reshape(h, w),
        out_alpha.reshape(h, w),
    )
