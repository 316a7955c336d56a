"""Regr3D pointmap distillation loss (jit-compatible dense-masked version).

TPU-native port of the reference's Regr3D
(reference: src/loss/loss_point.py:189-260): pseudo-GT pointmaps from the
DUSt3R teacher supervise the student's predicted pointmaps with an L2 norm
after joint pointcloud normalization, masked to points whose GT distance
lies within the [0.2%, 99.8%] batch quantiles and whose teacher confidence
is >= 3. Boolean indexing is replaced by dense `where` masking so shapes
stay static under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spfsplatv2_tpu.geometry.pointcloud import normalize_pointcloud


def _masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def regr3d_loss(
    gt_pts1: jax.Array,   # (b, h, w, 3) teacher view-1 points (view-0 frame)
    gt_pts2: jax.Array,
    pr_pts1: jax.Array,   # student pointmaps
    pr_pts2: jax.Array,
    conf1: jax.Array,     # (b, h, w) teacher confidence
    conf2: jax.Array,
    norm_mode: str = "avg_dis",
    conf_min: float = 3.0,
    quantiles: tuple[float, float] = (0.002, 0.998),
    disable_view1: bool = False,
) -> jax.Array:
    b = gt_pts1.shape[0]
    dis1 = jnp.linalg.norm(gt_pts1, axis=-1)
    dis2 = jnp.linalg.norm(gt_pts2, axis=-1)

    def quantile_mask(dis):
        flat = dis.reshape(b, -1)
        lo = jnp.quantile(flat, quantiles[0], axis=1)[:, None, None]
        hi = jnp.quantile(flat, quantiles[1], axis=1)[:, None, None]
        return (dis >= lo) & (dis <= hi)

    valid1 = quantile_mask(dis1) & (conf1 >= conf_min)
    valid2 = quantile_mask(dis2) & (conf2 >= conf_min)

    if norm_mode:
        pr_pts1, pr_pts2, _ = normalize_pointcloud(
            pr_pts1, pr_pts2, norm_mode, valid1, valid2
        )
        gt_pts1, gt_pts2, _ = normalize_pointcloud(
            gt_pts1, gt_pts2, norm_mode, valid1, valid2
        )

    loss1 = jnp.linalg.norm(pr_pts1 - gt_pts1, axis=-1)
    loss2 = jnp.linalg.norm(pr_pts2 - gt_pts2, axis=-1)
    total = _masked_mean(loss2, valid2)
    if not disable_view1:
        total = total + _masked_mean(loss1, valid1)
    return total
