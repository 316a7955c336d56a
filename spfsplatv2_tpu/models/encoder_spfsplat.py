"""SPFSplat (v1, ICCV) encoder: the unmasked-backbone variant.

TPU-native re-design of the reference `EncoderSPFSplat`
(reference: src/model/encoder/encoder_spfsplat.py:39-383):

  * unmasked multi-view CroCo backbone (`croco_multi`) run TWICE — once over
    context views only (pointmaps / Gaussians / context poses) and once over
    context+target views (poses for all views),
  * per-view DPT pointmap + DPT-GS heads exactly like v2,
  * pose heads read the POOLED patch tokens (concat of encoder 1024d and
    last-decoder 768d features, `concat_enc`), not a learnable pose token
    (reference heads/pose_head.py:79-96), with homogeneous 4D translation
    (`use_homogeneous`) and un-zeroed `fc_t` (`pose_init_t: false`)
    per config/model/encoder/spfsplat.yaml:40-43,
  * pose post-processing with baseline-1 rescale ON by default
    (config/model/encoder/spfsplat.yaml:33).

Returns BOTH pose sets: `extrinsics_c` from the context-only decoder pass
and `extrinsics_cwt` from the with-target pass — the v1 reprojection loss
uses cwt poses for its main terms plus a detached-pts3d term on the
context-only poses (reference src/model/model_wrapper.py:284-304).
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
from spfsplatv2_tpu.models.croco.backbone_multi import (
    CrocoMultiBackbone,
    CrocoMultiBackboneConfig,
)
from spfsplatv2_tpu.models.encoder import OpacityMappingConfig, dpt_hooks
from spfsplatv2_tpu.models.heads.dpt import DPTGSHead, DPTHead
from spfsplatv2_tpu.models.heads.pose_head import PoseHead, PoseHeadConfig
from spfsplatv2_tpu.models.heads.postprocess import pts3d_postprocess


@dataclass(frozen=True)
class SPFSplatConfig:
    backbone: CrocoMultiBackboneConfig = field(
        default_factory=CrocoMultiBackboneConfig
    )
    pose_head: PoseHeadConfig = field(
        default_factory=lambda: PoseHeadConfig(
            init_t=False, use_homogeneous=True, concat_enc=True
        )
    )
    opacity_mapping: OpacityMappingConfig = field(
        default_factory=OpacityMappingConfig
    )
    sh_degree: int = 4
    dpt_feature_dim: int = 256
    dpt_last_dim: int = 128
    dpt_layer_dims: tuple[int, ...] = (96, 192, 384, 768)
    estimating_pose: bool = True
    estimating_focal: bool = False
    pose_make_baseline_1: bool = True
    pose_make_relative: bool = True
    input_mean: float = 0.5
    input_std: float = 0.5


class SPFSplatEncoder(nn.Module):
    cfg: SPFSplatConfig = field(default_factory=SPFSplatConfig)

    def _run_dual_heads(self, make_head, dec_feat, grid, extra=None):
        """Head 1 on view 0, head 2 on views 1..v-1 (same as the v2 path)."""
        hooked = [dec_feat[i] for i in dpt_hooks(len(dec_feat) - 1)]
        b, v = hooked[0].shape[:2]

        def tokens_for(sel):
            return [t[:, sel].reshape(-1, *t.shape[2:]) for t in hooked]

        h1 = make_head("1")
        h2 = make_head("2")
        args1 = (tokens_for(slice(0, 1)), grid)
        args2 = (tokens_for(slice(1, v)), grid)
        if extra is not None:
            args1 += (extra[:, 0],)
            args2 += (extra[:, 1:].reshape(-1, *extra.shape[2:]),)
        out1 = h1(*args1)
        out2 = h2(*args2)
        out1 = out1.reshape(b, 1, *out1.shape[1:])
        out2 = out2.reshape(b, v - 1, *out2.shape[1:])
        return jnp.concatenate([out1, out2], axis=1)

    @nn.compact
    def __call__(
        self,
        context_images: jax.Array,       # (b, v_cxt, h, w, 3) in [0, 1]
        context_intrinsics: jax.Array,   # (b, v_cxt, 3, 3) normalized
        target_images: Optional[jax.Array] = None,
        target_intrinsics: Optional[jax.Array] = None,
        global_step: jax.Array | int = 0,
    ) -> dict:
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
        images = (images - cfg.input_mean) / cfg.input_std

        out = CrocoMultiBackbone(cfg.backbone, name="backbone")(
            images, intrinsics, num_target=v_tgt
        )
        dec_feat, grid = out["dec_feat"], out["grid"]
        dec_feat_w_tgt = out["dec_feat_w_tgt"]

        # ---- pointmap heads (context-only pass) --------------------------
        raw_pts = self._run_dual_heads(
            lambda s: DPTHead(
                out_channels=3, feature_dim=cfg.dpt_feature_dim,
                last_dim=cfg.dpt_last_dim, layer_dims=cfg.dpt_layer_dims,
                out_bias=(0.0, 0.0, 1.2),  # from-scratch: points start ~z=2.3
                name=f"downstream_head{s}",
            ),
            dec_feat, grid,
        )
        pts3d = pts3d_postprocess(raw_pts, mode="exp")

        # ---- Gaussian parameter heads (context-only pass) ----------------
        gs_dim = raw_gaussian_channels(cfg.sh_degree)
        ctx_images_norm = images[:, :v_cxt]
        raw_gs = self._run_dual_heads(
            lambda s: DPTGSHead(
                out_channels=gs_dim, feature_dim=cfg.dpt_feature_dim,
                layer_dims=cfg.dpt_layer_dims,
                name=f"gaussian_param_head{s}",
            ),
            dec_feat, grid, extra=ctx_images_norm,
        )

        # ---- pose heads: pooled patch tokens, both decoder passes --------
        extrinsics_c = extrinsics_cwt = None
        if cfg.estimating_pose:
            head1 = PoseHead(cfg.pose_head, name="pose_head1")
            head2 = PoseHead(cfg.pose_head, name="pose_head2")

            def pose_pass(feats):
                # concat_enc: channel-concat encoder (1024d) and final
                # decoder (768d) patch tokens (reference pose_head.py:79-84).
                tokens = jnp.concatenate([feats[0], feats[-1]], axis=-1)
                v = tokens.shape[1]
                p1 = head1(tokens[:, 0])
                p2 = head2(tokens[:, 1:].reshape(b * (v - 1), *tokens.shape[2:]))
                return jnp.concatenate(
                    [p1[:, None], p2.reshape(b, v - 1, 9)], axis=1
                )

            extrinsics_c = self._process_pose(pose_pass(dec_feat), v_cxt)
            if dec_feat_w_tgt is not None:
                extrinsics_cwt = self._process_pose(
                    pose_pass(dec_feat_w_tgt), v_cxt
                )
            else:
                extrinsics_cwt = extrinsics_c

        # ---- assemble Gaussians ------------------------------------------
        densities = jax.nn.sigmoid(raw_gs[..., 0])
        opacities = map_pdf_to_opacity(
            densities, global_step,
            cfg.opacity_mapping.initial, cfg.opacity_mapping.final,
            cfg.opacity_mapping.warm_up,
        )
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

        out = {
            "gaussians": gaussians,
            "extrinsics_c": extrinsics_c,
            "extrinsics_cwt": extrinsics_cwt,
            "pts3d": pts3d,
            "depths": depths,
            "densities": densities,
            "variant": "spfsplat",
        }
        if cfg.estimating_focal:
            from spfsplatv2_tpu.geometry.intrinsics import estimate_intrinsics

            k_pred = estimate_intrinsics(pts3d)
            out["intrinsics_cwt"] = jnp.broadcast_to(
                k_pred[:, None], (b, v_cxt + v_tgt, 3, 3)
            )
        return out

    def _process_pose(self, pose_enc: jax.Array, v_cxt: int) -> jax.Array:
        """Reference encoder_spfsplat.py process_pose (same as v2's)."""
        poses = se3.pose_encoding_to_matrix(pose_enc)
        if self.cfg.pose_make_baseline_1:
            a = poses[:, 0, :3, 3]
            c = poses[:, v_cxt - 1, :3, 3]
            scale = jnp.linalg.norm(a - c, axis=-1)[:, None, None]
            poses = poses.at[:, :, :3, 3].set(
                poses[:, :, :3, 3] / jnp.maximum(scale, 1e-8)
            )
        if self.cfg.pose_make_relative:
            poses = se3.camera_normalization(poses[:, 0:1], poses)
        return poses
