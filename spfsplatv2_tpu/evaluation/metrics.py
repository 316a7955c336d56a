"""Image and pose evaluation metrics.

TPU-native port of the reference metrics
(reference: src/evaluation/metrics.py:11-128):
  * PSNR on [0, 1] images,
  * SSIM (gaussian-window; losses/ssim.py),
  * LPIPS (losses/lpips.py; canonical only with converted VGG weights),
  * pose errors: geodesic rotation angle + translation-direction angle with
    the 180-degree ambiguity, and AUC@{5, 10, 20} degrees
    (src/misc/cam_utils.py:257-271).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from spfsplatv2_tpu.geometry import se3
from spfsplatv2_tpu.losses.ssim import ssim


def compute_psnr(ground_truth: jax.Array, predicted: jax.Array) -> jax.Array:
    """(batch, h, w, 3) in [0, 1] -> (batch,) PSNR in dB."""
    gt = jnp.clip(ground_truth, 0.0, 1.0)
    pred = jnp.clip(predicted, 0.0, 1.0)
    mse = jnp.mean((gt - pred) ** 2, axis=(-3, -2, -1))
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def compute_ssim(ground_truth: jax.Array, predicted: jax.Array) -> jax.Array:
    return ssim(
        jnp.clip(predicted, 0.0, 1.0), jnp.clip(ground_truth, 0.0, 1.0)
    )


def compute_lpips(lpips_params, ground_truth, predicted) -> jax.Array:
    from spfsplatv2_tpu.losses.lpips import LPIPS

    model = LPIPS()
    return model.apply(
        lpips_params,
        jnp.clip(predicted, 0, 1) * 2 - 1,
        jnp.clip(ground_truth, 0, 1) * 2 - 1,
    )


def compute_pose_error(
    predicted_c2w: jax.Array, gt_c2w: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """(..., 4, 4) poses -> (rotation deg, translation-direction deg)."""
    rot = se3.rotation_angle_deg(
        predicted_c2w[..., :3, :3], gt_c2w[..., :3, :3]
    )
    tr = se3.translation_angle_deg(
        predicted_c2w[..., :3, 3], gt_c2w[..., :3, 3]
    )
    return rot, tr


def pose_auc_summary(
    rot_errors_deg: np.ndarray,
    transl_errors_deg: np.ndarray,
    thresholds=(5.0, 10.0, 20.0),
) -> dict:
    """Reference on_test_end summary (src/model/model_wrapper.py:621-645)."""
    combined = np.maximum(rot_errors_deg, transl_errors_deg)
    out = {}
    for name, err in (
        ("rotation", rot_errors_deg),
        ("translation", transl_errors_deg),
        ("pose", combined),
    ):
        aucs = se3.pose_auc(err, list(thresholds))
        out[f"{name}_auc"] = {
            f"@{int(t)}deg": a for t, a in zip(thresholds, aucs)
        }
        out[f"{name}_median_deg"] = float(np.median(err))
    return out
