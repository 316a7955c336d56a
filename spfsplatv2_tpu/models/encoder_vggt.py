"""SPFSplatV2-L encoder: the VGGT-1B-based variant.

TPU-native re-design of the reference `EncoderSPFSplatV2L`
(reference: src/model/encoder/encoder_spfsplatv2l.py:44-295):

  * VGGT aggregator (DINOv2/14 + alternating frame/global attention with the
    context->target mask on global attention) over context (+ target) views,
  * camera head: 4-iteration AdaLN refinement -> 9D [absT quatR FoV] w2c
    encoding -> c2w via closed-form SE(3) inverse -> baseline/relative
    normalization,
  * point head on CONTEXT tokens only -> pixel-aligned pointmaps,
  * DPT-GS head with RGB skip -> raw Gaussian parameters,
  * unified Gaussian adapter (shared with the MASt3R path).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from spfsplatv2_tpu.geometry import se3
from spfsplatv2_tpu.models.adapter import (
    map_pdf_to_opacity,
    raw_gaussian_channels,
    unified_gaussian_adapter,
)
from spfsplatv2_tpu.models.encoder import OpacityMappingConfig
from spfsplatv2_tpu.models.vggt.aggregator import AggregatorConfig, VGGTAggregator
from spfsplatv2_tpu.models.vggt.camera_head import (
    CameraHead,
    CameraHeadConfig,
    pose_encoding_to_w2c,
)
from spfsplatv2_tpu.models.vggt.dpt_head import VGGTDPTHead


@dataclass(frozen=True)
class SPFSplatV2LConfig:
    aggregator: AggregatorConfig = field(default_factory=AggregatorConfig)
    camera_head: CameraHeadConfig = field(default_factory=CameraHeadConfig)
    opacity_mapping: OpacityMappingConfig = field(
        default_factory=OpacityMappingConfig
    )
    sh_degree: int = 4
    estimating_pose: bool = True
    pose_make_baseline_1: bool = False
    pose_make_relative: bool = True


class SPFSplatV2LEncoder(nn.Module):
    cfg: SPFSplatV2LConfig = field(default_factory=SPFSplatV2LConfig)

    @nn.compact
    def __call__(
        self,
        context_images: jax.Array,       # (b, v_cxt, h, w, 3) in [0, 1]
        context_intrinsics: jax.Array,   # (b, v_cxt, 3, 3) normalized
        target_images: Optional[jax.Array] = None,
        target_intrinsics: Optional[jax.Array] = None,
        global_step: jax.Array | int = 0,
        context_valid: Optional[jax.Array] = None,  # (v_cxt,)
        target_valid: Optional[jax.Array] = None,   # (v_tgt,)
    ) -> dict:
        """`context_valid`/`target_valid` implement random view dropout with
        STATIC shapes, mirroring the CroCo-path encoder (the reference
        slices the batch instead, model_wrapper.py:91-116, which would
        recompile the 1.3B-param step per draw; the 10-view v2-l checkpoint
        is trained with random context dropout, reference README.md:78-86):
        dropped views vanish from the global attention and contribute
        zero-opacity Gaussians."""
        cfg = self.cfg
        b, v_cxt, h, w, _ = context_images.shape
        v_tgt = 0 if target_images is None else target_images.shape[1]

        images = context_images
        intrinsics = context_intrinsics
        if v_tgt:
            images = jnp.concatenate([context_images, target_images], axis=1)
            intrinsics = jnp.concatenate(
                [context_intrinsics, target_intrinsics], axis=1
            )

        view_valid = None
        if context_valid is not None or target_valid is not None:
            cv = (jnp.ones((v_cxt,)) if context_valid is None
                  else context_valid.astype(jnp.float32))
            tv = (jnp.ones((v_tgt,)) if target_valid is None
                  else target_valid.astype(jnp.float32))
            view_valid = jnp.concatenate([cv, tv]) if v_tgt else cv

        agg = VGGTAggregator(cfg.aggregator, name="aggregator")(
            images, intrinsics, num_target=v_tgt, view_valid=view_valid
        )
        tokens, patch_start, grid = agg["tokens"], agg["patch_start"], agg["grid"]

        extrinsics_c = extrinsics_cwt = None
        if cfg.estimating_pose:
            camera_tokens = tokens[-1][:, :, 0]  # (b, v, 2C) camera token
            pose_enc = CameraHead(cfg.camera_head, name="camera_head")(
                camera_tokens, view_valid=view_valid
            )
            w2c = pose_encoding_to_w2c(pose_enc)  # (b, v, 4, 4)
            poses = se3.inverse_se3(w2c)  # closed_form_inverse_se3 -> c2w
            poses = self._normalize_poses(poses, v_cxt)
            extrinsics_c = poses[:, :v_cxt]
            extrinsics_cwt = poses

        ctx_tokens = [t[:, :v_cxt] for t in tokens]

        pts3d, conf = VGGTDPTHead(
            output_dim=4, gs_variant=False, name="point_head",
            patch_size=cfg.aggregator.patch_size,
        )(ctx_tokens, grid, patch_start)

        gs_dim = raw_gaussian_channels(cfg.sh_degree)
        raw_gs = VGGTDPTHead(
            output_dim=gs_dim, gs_variant=True, name="gaussian_param_head",
            patch_size=cfg.aggregator.patch_size,
        )(ctx_tokens, grid, patch_start, images=context_images)

        densities = jax.nn.sigmoid(raw_gs[..., 0])
        opacities = map_pdf_to_opacity(
            densities, global_step,
            cfg.opacity_mapping.initial, cfg.opacity_mapping.final,
            cfg.opacity_mapping.warm_up,
        )
        if context_valid is not None:
            # Dropped context views contribute nothing to the render.
            opacities = opacities * context_valid.astype(opacities.dtype)[
                None, :, None, None
            ]
        gaussians = unified_gaussian_adapter(
            pts3d.reshape(b, v_cxt, h * w, 3),
            opacities.reshape(b, v_cxt, h * w),
            raw_gs[..., 1:].reshape(b, v_cxt, h * w, gs_dim - 1),
            sh_degree=cfg.sh_degree,
        ).flatten_views()

        depths = None
        if extrinsics_c is not None:
            depths = se3.depth_from_pose(
                pts3d.reshape(b, v_cxt, h * w, 3), extrinsics_c
            ).reshape(b, v_cxt, h, w)

        return {
            "gaussians": gaussians,
            "extrinsics_c": extrinsics_c,
            "extrinsics_cwt": extrinsics_cwt,
            "pts3d": pts3d,
            "pts3d_conf": conf,
            "depths": depths,
            "densities": densities,
        }

    def _normalize_poses(self, poses: jax.Array, v_cxt: int) -> jax.Array:
        """Baseline-1 rescale + relative-to-view-0 normalization
        (reference encoder_spfsplatv2l.py:248-269)."""
        cfg = self.cfg
        if cfg.pose_make_baseline_1:
            a = poses[:, 0, :3, 3]
            c = poses[:, v_cxt - 1, :3, 3]
            scale = jnp.linalg.norm(a - c, axis=-1)[:, None, None]
            poses = poses.at[:, :, :3, 3].set(
                poses[:, :, :3, 3] / jnp.maximum(scale, 1e-8)
            )
        if cfg.pose_make_relative:
            poses = se3.camera_normalization(poses[:, 0:1], poses)
        return poses
