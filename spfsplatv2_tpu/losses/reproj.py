"""Reprojection consistency loss — the pose self-supervision signal.

TPU-native port of the reference's ACE-Zero-style loss
(reference: src/loss/loss_reproj.py:28-156): per-view predicted 3D points
are projected with that view's predicted pose + GT intrinsics; the per-pixel
distance to the pixel grid is penalized with a (dynamically scheduled) tanh
soft clamp. The reference's boolean-mask indexing is replaced by dense
`where` masking so the whole loss stays jit-compatible with static shapes.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from spfsplatv2_tpu.geometry import se3


@dataclass(frozen=True)
class ReprojConfig:
    weight: float = 1e-3
    mode: str = "dyntanh"
    circle_schedule: bool = True
    total_iterations: int = 300_001
    hard_clamp: float = 1000.0
    soft_clamp: float = 50.0
    soft_clamp_min: float = 1.0


def reproj_loss(
    pts3d: jax.Array,        # (b, h, w, 3) predicted world points
    c2w: jax.Array,          # (b, 4, 4) predicted pose of the SAME view
    intrinsics: jax.Array,   # (b, 3, 3) normalized GT intrinsics
    global_step,
    cfg: ReprojConfig = ReprojConfig(),
    detach_pts3d: bool = False,
) -> jax.Array:
    b, h, w, _ = pts3d.shape
    if detach_pts3d:
        pts3d = jax.lax.stop_gradient(pts3d)

    k_px = intrinsics * jnp.asarray(
        [[w, w, w], [h, h, h], [1.0, 1.0, 1.0]], intrinsics.dtype
    )
    pred_px = se3.project_to_cam(pts3d.reshape(b, h * w, 3), c2w, k_px)
    pred_px = pred_px.reshape(b, h, w, 2)
    # Runaway-point guard: points near/behind the camera plane project to
    # +-inf pixels (project_to_cam clamps z at 1e-6), and inf/inf in the
    # norm's VJP poisons the WHOLE batch gradient with NaN even though the
    # hard clamp zeroes these pixels' loss.  Clipping keeps err finite and
    # routes exactly-zero gradient to clipped pixels (they are far past
    # hard_clamp anyway).
    pred_px = jnp.clip(pred_px, -1e7, 1e7)

    xs = jnp.arange(w, dtype=pts3d.dtype)
    ys = jnp.arange(h, dtype=pts3d.dtype)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    target_px = jnp.stack([gx, gy], axis=-1)

    # eps inside the sqrt: a pixel with EXACTLY zero error otherwise hits
    # d(sqrt)/dx = x/(2*0) = NaN in the backward.
    err = jnp.sqrt(
        jnp.sum((pred_px - target_px[None]) ** 2, axis=-1) + 1e-12
    )  # (b, h, w)
    valid = err <= cfg.hard_clamp
    n_valid = jnp.maximum(jnp.sum(valid), 1)

    if cfg.mode == "dyntanh":
        progress = jnp.clip(global_step / cfg.total_iterations, 0.0, 1.0)
        if cfg.circle_schedule:
            progress = 1.0 - jnp.sqrt(jnp.maximum(1.0 - progress**2, 0.0))
        soft = (1.0 - progress) * cfg.soft_clamp + cfg.soft_clamp_min
    elif cfg.mode == "tanh":
        soft = cfg.soft_clamp
    else:
        raise NotImplementedError(f"reproj mode {cfg.mode!r}")

    per_px = soft * jnp.tanh(err / soft)
    total = jnp.sum(jnp.where(valid, per_px, 0.0))
    return cfg.weight * total / n_valid
