"""Shared pieces of the differentiable Gaussian rasterizer.

This module implements the camera-space projection stage (EWA splatting of 3D
Gaussians to screen-space 2D Gaussians) as dense, fully-vectorized,
autodiff-friendly XLA. The compositing stages live in `raster_ref`
(per-pixel oracle), `raster_tiled` (tile-binned XLA) and `raster_pallas`
(Pallas TPU kernel).

Replaces the projection/preprocess stage of the reference's external CUDA
rasterizer `diff_gauss_pose` (call surface: reference
src/model/decoder/cuda_splatting.py:45-144). Numerical conventions follow the
original 3DGS CUDA preprocess:
  * near-plane cull at z <= 0.2
  * EWA Jacobian with t.x/t.z clamped to 1.3 * tan(fov/2)
  * +0.3 px low-pass added to the 2D covariance diagonal
  * radius = ceil(3 * sqrt(lambda_max))
  * pixel sample points at integer coordinates, principal point at
    (W-1)/2 for centered normalized intrinsics
Gradients flow to means, covariances, SH, opacities AND the camera pose
(the `viewmatrix` gradient of the diff_gauss_pose fork) because the whole
projection stage is plain differentiable XLA.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from spfsplatv2_tpu.geometry.se3 import inverse_se3
from spfsplatv2_tpu.ops.sh import eval_sh_colors

NEAR_CULL = 0.2          # 3DGS near-plane cull threshold
LOWPASS = 0.3            # screen-space low-pass filter added to cov2d diag
ALPHA_MAX = 0.99         # per-gaussian alpha clamp
ALPHA_MIN = 1.0 / 255.0  # skip threshold
T_EPS = 1e-4             # transmittance early-stop threshold


class ProjectedGaussians(NamedTuple):
    """Screen-space 2D Gaussians for ONE camera.

    xy:      (g, 2) pixel coords (integer-centered convention)
    conic:   (g, 3) inverse 2D covariance (a, b, c) for [[a, b], [b, c]]
    depth:   (g,)   camera-space z
    color:   (g, 3) view-dependent RGB (SH evaluated)
    opacity: (g,)
    radius:  (g,)   int32 screen radius in pixels (0 => culled)
    rx, ry:  (g,)   int32 per-axis 3-sigma half-extents (<= radius): the
             marginal bound power <= -dx^2 / (2 cov_xx) holds under
             correlation, so the ellipse AABB truncates with the SAME
             exp(-4.5) alpha bound as the circular radius while touching
             fewer tiles for anisotropic gaussians.
    """

    xy: jax.Array
    conic: jax.Array
    depth: jax.Array
    color: jax.Array
    opacity: jax.Array
    radius: jax.Array
    rx: jax.Array
    ry: jax.Array


def project_gaussians(
    means: jax.Array,
    covariances: jax.Array,
    harmonics: jax.Array,
    opacities: jax.Array,
    c2w: jax.Array,
    intrinsics: jax.Array,
    image_shape: tuple[int, int],
    sh_degree: int | None = None,
    use_sh: bool = True,
    ewa_reference_shape: tuple[int, int] | None = None,
) -> ProjectedGaussians:
    """Project one camera's view of a set of world-space Gaussians.

    means (g, 3), covariances (g, 3, 3), harmonics (g, 3, d_sh),
    opacities (g,), c2w (4, 4), intrinsics (3, 3) NORMALIZED.
    """
    h, w = image_shape
    dtype = means.dtype

    w2c = inverse_se3(c2w)
    rot = w2c[:3, :3]
    t_cam = jnp.einsum("ij,gj->gi", rot, means) + w2c[:3, 3]
    tz = t_cam[..., 2]
    valid = tz > NEAR_CULL
    tz_safe = jnp.where(valid, tz, 1.0)

    fx = intrinsics[0, 0] * w
    fy = intrinsics[1, 1] * h
    cx = intrinsics[0, 2] * w - 0.5
    cy = intrinsics[1, 2] * h - 0.5

    px = fx * t_cam[..., 0] / tz_safe + cx
    py = fy * t_cam[..., 1] / tz_safe + cy
    xy = jnp.stack([px, py], axis=-1)

    # EWA: clamp the frustum-space coords like the CUDA preprocess does.
    # For band (tile-sharded) rendering the clamp must reference the FULL
    # image frustum so per-gaussian conics match the unsharded render.
    h_ref, w_ref = ewa_reference_shape or (h, w)
    tan_fx = 0.5 * w_ref / fx
    tan_fy = 0.5 * h_ref / fy
    lim_x = 1.3 * tan_fx
    lim_y = 1.3 * tan_fy
    txz = jnp.clip(t_cam[..., 0] / tz_safe, -lim_x, lim_x) * tz_safe
    tyz = jnp.clip(t_cam[..., 1] / tz_safe, -lim_y, lim_y) * tz_safe

    # EWA 2x2 covariance, hand-expanded over FLAT (g,) arrays.  The
    # (g, 2, 3) einsum formulation makes XLA carry (g, 1, 1)/(g, 2, 2)
    # intermediates with T(1,128) layouts through the JVP (12.5% VPU lane
    # efficiency; profiled ~4.4 ms/camera); flat expansion fuses into
    # full-width T(1024) loops.  A = J @ R with J row0 = [fx/z, 0,
    # -fx tx/z^2], row1 = [0, fy/z, -fy ty/z^2]; cov2d = A Sigma A^T.
    u0 = fx / tz_safe
    u1 = fy / tz_safe
    w0 = fx * txz / (tz_safe * tz_safe)
    w1 = fy * tyz / (tz_safe * tz_safe)
    a_row0 = [u0 * rot[0, k] - w0 * rot[2, k] for k in range(3)]
    a_row1 = [u1 * rot[1, k] - w1 * rot[2, k] for k in range(3)]
    s = [[covariances[..., l, k] for k in range(3)] for l in range(3)]
    t0 = [sum(a_row0[l] * s[l][k] for l in range(3)) for k in range(3)]
    t1 = [sum(a_row1[l] * s[l][k] for l in range(3)) for k in range(3)]
    a = sum(t0[k] * a_row0[k] for k in range(3)) + LOWPASS
    b = sum(t0[k] * a_row1[k] for k in range(3))
    c = sum(t1[k] * a_row1[k] for k in range(3)) + LOWPASS

    det = a * c - b * b
    det_valid = det > 0
    det_safe = jnp.where(det_valid, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    mid = 0.5 * (a + c)
    lam_max = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam_max))

    valid = valid & det_valid & (radius > 0)
    radius = jnp.where(valid, radius, 0.0).astype(jnp.int32)
    rx = jnp.where(valid, jnp.ceil(3.0 * jnp.sqrt(a)), 0.0).astype(jnp.int32)
    ry = jnp.where(valid, jnp.ceil(3.0 * jnp.sqrt(c)), 0.0).astype(jnp.int32)

    if use_sh:
        campos = c2w[:3, 3]
        view_dir = means - campos
        view_dir = view_dir / (
            jnp.linalg.norm(view_dir, axis=-1, keepdims=True) + 1e-12
        )
        color = eval_sh_colors(harmonics, view_dir, degree=sh_degree)
    else:
        color = harmonics[..., 0]

    depth = jnp.where(valid, tz, jnp.inf).astype(dtype)
    return ProjectedGaussians(
        xy=xy,
        conic=conic,
        depth=depth,
        color=color,
        opacity=opacities,
        radius=radius,
        rx=rx,
        ry=ry,
    )


def alpha_from_conic(
    xy: jax.Array,
    conic: jax.Array,
    opacity: jax.Array,
    pix: jax.Array,
) -> jax.Array:
    """Evaluate per-pixel alphas of screen-space Gaussians.

    xy (..., g, 2), conic (..., g, 3), opacity (..., g,), pix (..., p, 2)
    -> alpha (..., p, g). Applies the CUDA power>0 skip, the 0.99 clamp
    and the 1/255 cutoff.
    """
    d = pix[..., :, None, :] - xy[..., None, :, :]  # (p, g, 2)
    dx, dy = d[..., 0], d[..., 1]
    power = (
        -0.5 * (conic[..., None, :, 0] * dx * dx + conic[..., None, :, 2] * dy * dy)
        - conic[..., None, :, 1] * dx * dy
    )
    alpha = jnp.minimum(ALPHA_MAX, opacity[..., None, :] * jnp.exp(power))
    keep = (power <= 0.0) & (alpha >= ALPHA_MIN)
    return jnp.where(keep, alpha, 0.0)
