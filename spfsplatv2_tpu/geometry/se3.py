"""SE(3)/SO(3) algebra, rotation representations and camera-pose utilities.

Pure-JAX, fully batched, differentiable. TPU-native replacements for the
reference's torch/pytorch3d pose math:
  - quaternion <-> rotation matrix     (ref: src/model/encoder/common/gaussians.py:8-30)
  - 6D rotation -> matrix              (ref: pytorch3d rotation_6d_to_matrix via
                                        src/misc/cam_utils.py:275-286)
  - SO3/SE3 exp maps                   (ref: src/misc/cam_utils.py:69-117)
  - camera normalization to a pivot    (ref: src/misc/cam_utils.py:29-44)
  - projection to camera / depth       (ref: src/misc/cam_utils.py:289-318)
  - pose AUC                           (ref: src/misc/cam_utils.py:257-271)

Conventions: extrinsics are camera-to-world (c2w) 4x4 matrices; quaternions
are (w, x, y, z).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quaternion_to_matrix(q: jax.Array, eps: float = 1e-8) -> jax.Array:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + eps)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(*q.shape[:-1], 3, 3)


def matrix_to_quaternion(m: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix -> (..., 4) wxyz quaternion (w >= 0).

    Branch-free Shepperd's method: compute all four candidate constructions and
    select the numerically best by the largest diagonal combination.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four candidate 4*q_i^2 values.
    qw2 = jnp.maximum(0.0, 1 + m00 + m11 + m22)
    qx2 = jnp.maximum(0.0, 1 + m00 - m11 - m22)
    qy2 = jnp.maximum(0.0, 1 - m00 + m11 - m22)
    qz2 = jnp.maximum(0.0, 1 - m00 - m11 + m22)

    cand = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(cand, axis=-1)

    def from_w():
        w = 0.5 * jnp.sqrt(qw2 + 1e-24)
        return jnp.stack(
            [w, (m21 - m12) / (4 * w), (m02 - m20) / (4 * w), (m10 - m01) / (4 * w)],
            axis=-1,
        )

    def from_x():
        x = 0.5 * jnp.sqrt(qx2 + 1e-24)
        return jnp.stack(
            [(m21 - m12) / (4 * x), x, (m01 + m10) / (4 * x), (m02 + m20) / (4 * x)],
            axis=-1,
        )

    def from_y():
        y = 0.5 * jnp.sqrt(qy2 + 1e-24)
        return jnp.stack(
            [(m02 - m20) / (4 * y), (m01 + m10) / (4 * y), y, (m12 + m21) / (4 * y)],
            axis=-1,
        )

    def from_z():
        z = 0.5 * jnp.sqrt(qz2 + 1e-24)
        return jnp.stack(
            [(m10 - m01) / (4 * z), (m02 + m20) / (4 * z), (m12 + m21) / (4 * z), z],
            axis=-1,
        )

    qs = jnp.stack([from_w(), from_x(), from_y(), from_z()], axis=-2)
    q = jnp.take_along_axis(qs, best[..., None, None], axis=-2)[..., 0, :]
    q = jnp.where(q[..., :1] < 0, -q, q)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def rotation_6d_to_matrix(d6: jax.Array, eps: float = 1e-8) -> jax.Array:
    """6D rotation representation (Zhou et al.) -> (..., 3, 3) via Gram-Schmidt.

    Matches pytorch3d.transforms.rotation_6d_to_matrix semantics: the 6 values
    are the first two *rows* of the matrix before orthonormalization.
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / (jnp.linalg.norm(a1, axis=-1, keepdims=True) + eps)
    a2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2 / (jnp.linalg.norm(a2, axis=-1, keepdims=True) + eps)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(m: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 6): first two rows, flattened."""
    return m[..., :2, :].reshape(*m.shape[:-2], 6)


def skew(v: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) skew-symmetric cross-product matrix."""
    zeros = jnp.zeros_like(v[..., 0])
    rows = jnp.stack(
        [zeros, -v[..., 2], v[..., 1],
         v[..., 2], zeros, -v[..., 0],
         -v[..., 1], v[..., 0], zeros],
        axis=-1,
    )
    return rows.reshape(*v.shape[:-1], 3, 3)


def so3_exp(theta: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Rodrigues exponential map: (..., 3) axis-angle -> (..., 3, 3).

    Differentiable at theta = 0 (double-where on the squared norm keeps the
    sqrt out of the gradient path near zero — plain norm() has a NaN grad
    at the origin, which is exactly where test-time pose alignment starts).
    """
    sq = jnp.sum(theta**2, axis=-1, keepdims=True)[..., None]
    small = sq < 1e-10
    angle = jnp.sqrt(jnp.where(small, 1.0, sq))
    w = skew(theta)
    w2 = w @ w
    eye = jnp.broadcast_to(jnp.eye(3, dtype=theta.dtype), w.shape)
    a = jnp.where(small, 1.0, jnp.sin(angle) / angle)
    b = jnp.where(small, 0.5, (1 - jnp.cos(angle)) / jnp.where(small, 1.0, sq))
    return eye + a * w + b * w2


def se3_exp(tau: jax.Array) -> jax.Array:
    """(..., 6) [rho, theta] -> (..., 4, 4) SE3 matrix.

    Differentiable at tau = 0 (see so3_exp).
    """
    rho, theta = tau[..., :3], tau[..., 3:]
    sq = jnp.sum(theta**2, axis=-1, keepdims=True)[..., None]
    small = sq < 1e-10
    safe_sq = jnp.where(small, 1.0, sq)
    angle = jnp.sqrt(safe_sq)
    w = skew(theta)
    w2 = w @ w
    eye = jnp.broadcast_to(jnp.eye(3, dtype=tau.dtype), w.shape)
    b = jnp.where(small, 0.5, (1 - jnp.cos(angle)) / safe_sq)
    c = jnp.where(
        small, 1.0 / 6.0, (angle - jnp.sin(angle)) / (safe_sq * angle)
    )
    v = eye + b * w + c * w2
    r = so3_exp(theta)
    t = (v @ rho[..., None])[..., 0]
    return pack_rt(r, t)


def pack_rt(r: jax.Array, t: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation + (..., 3) translation -> (..., 4, 4)."""
    batch = r.shape[:-2]
    top = jnp.concatenate([r, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0, 0, 0, 1], dtype=r.dtype), (*batch, 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def inverse_se3(m: jax.Array) -> jax.Array:
    """Closed-form inverse of a rigid transform (..., 4, 4)."""
    r = m[..., :3, :3]
    t = m[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    return pack_rt(rt, -(rt @ t[..., None])[..., 0])


def pose_encoding_to_matrix(enc: jax.Array) -> jax.Array:
    """9D pose encoding [6D rot | 3D t] -> (..., 4, 4) c2w.

    Reference: convert_pose_to_4x4, src/misc/cam_utils.py:275-286.
    """
    return pack_rt(rotation_6d_to_matrix(enc[..., :6]), enc[..., 6:9])


def camera_normalization(pivot: jax.Array, poses: jax.Array) -> jax.Array:
    """Re-express `poses` so that `pivot` becomes identity.

    pivot: (..., 4, 4); poses: (..., v, 4, 4) (pivot broadcast against poses).
    Reference: src/misc/cam_utils.py:29-44.
    """
    return inverse_se3(pivot) @ poses


def relative_pose(a: jax.Array, b: jax.Array) -> jax.Array:
    """a^-1 @ b for c2w poses."""
    return inverse_se3(a) @ b


def project_to_cam(
    pts3d: jax.Array,
    c2w: jax.Array,
    intrinsics: jax.Array,
    return_z: bool = False,
):
    """Project world points into a camera.

    pts3d: (..., n, 3); c2w: (..., 4, 4); intrinsics: (..., 3, 3) in PIXEL units.
    Returns pixel coords (..., n, 2) [and optionally z (..., n, 1)].
    Reference: src/misc/cam_utils.py:289-307.
    """
    w2c = inverse_se3(c2w)
    cam = jnp.einsum("...ij,...nj->...ni", w2c[..., :3, :3], pts3d) + w2c[..., None, :3, 3]
    px = jnp.einsum("...ij,...nj->...ni", intrinsics, cam)
    z = jnp.maximum(px[..., 2:3], 1e-6)
    xy = px[..., :2] / z
    if return_z:
        return xy, cam[..., 2:3]
    return xy


def depth_from_pose(pts3d: jax.Array, c2w: jax.Array) -> jax.Array:
    """Per-point z-depth in the camera frame: (..., n, 3), (..., 4, 4) -> (..., n).

    Reference: depth_projector, src/misc/cam_utils.py:310-318.
    """
    w2c = inverse_se3(c2w)
    cam = jnp.einsum("...ij,...nj->...ni", w2c[..., :3, :3], pts3d) + w2c[..., None, :3, 3]
    return cam[..., 2]


def rotation_angle_deg(r1: jax.Array, r2: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Geodesic angle between rotations in degrees."""
    m = r1 @ jnp.swapaxes(r2, -1, -2)
    trace = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    cos = jnp.clip((trace - 1) / 2, -1 + eps, 1 - eps)
    return jnp.degrees(jnp.arccos(cos))


def translation_angle_deg(t1: jax.Array, t2: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Angle between translation directions (degrees), with 180-deg ambiguity."""
    n1 = t1 / (jnp.linalg.norm(t1, axis=-1, keepdims=True) + eps)
    n2 = t2 / (jnp.linalg.norm(t2, axis=-1, keepdims=True) + eps)
    cos = jnp.clip(jnp.abs(jnp.sum(n1 * n2, axis=-1)), 0.0, 1.0 - 1e-7)
    return jnp.degrees(jnp.arccos(cos))


def pose_auc(errors: np.ndarray, thresholds: list[float]) -> list[float]:
    """Area under the recall curve at error thresholds (host-side numpy).

    Reference: src/misc/cam_utils.py:257-271.
    """
    errors = np.sort(np.asarray(errors))
    recall = (np.arange(len(errors)) + 1) / len(errors)
    errors = np.r_[0.0, errors]
    recall = np.r_[0.0, recall]
    aucs = []
    for t in thresholds:
        last = np.searchsorted(errors, t)
        r = np.r_[recall[:last], recall[max(last - 1, 0)]]
        e = np.r_[errors[:last], t]
        aucs.append(float(np.trapezoid(r, x=e) / t))
    return aucs
