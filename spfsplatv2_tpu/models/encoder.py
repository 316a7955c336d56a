"""SPFSplatV2 encoder: unposed images -> pixel-aligned Gaussians + poses.

TPU-native re-design of the reference flagship encoder
(reference: src/model/encoder/encoder_spfsplatv2.py:78-383):

  * masked multi-view CroCo backbone over context (+ target) views,
  * per-view DPT pointmap heads (head 1 specialized for view 0, head 2
    shared by the rest — the DUSt3R asymmetry),
  * per-view DPT-GS heads with RGB skip -> raw Gaussian parameters
    (opacity + scale + rotation + SH = 83 channels at sh_degree 4),
  * per-view MLP pose heads on the learnable pose token -> 9D pose encoding,
  * pose post-processing (6D->SE3, optional baseline-1 rescale, relative to
    view 0) and the unified Gaussian adapter.

Instead of the reference's per-view Python loops over heads
(encoder_spfsplatv2.py:209-236), views sharing a head are folded into the
batch axis so every head runs as one large MXU-friendly call.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from spfsplatv2_tpu.gaussians import Gaussians
from spfsplatv2_tpu.geometry import se3
from spfsplatv2_tpu.models.adapter import (
    map_pdf_to_opacity,
    raw_gaussian_channels,
    unified_gaussian_adapter,
)
from spfsplatv2_tpu.models.croco.backbone import (
    CrocoBackboneConfig,
    MaskedCrocoBackbone,
)
from spfsplatv2_tpu.models.heads.dpt import DPTGSHead, DPTHead
from spfsplatv2_tpu.models.heads.pose_head import PoseHead, PoseHeadConfig
from spfsplatv2_tpu.models.heads.postprocess import pts3d_postprocess

def dpt_hooks(dec_depth: int) -> tuple[int, ...]:
    """Hook layers [0, D/2, 3D/4, D] (reference dpt_head.py:110)."""
    return (0, dec_depth * 2 // 4, dec_depth * 3 // 4, dec_depth)


@dataclass(frozen=True)
class OpacityMappingConfig:
    initial: float = 0.0
    final: float = 0.0
    warm_up: int = 1


@dataclass(frozen=True)
class SPFSplatV2Config:
    backbone: CrocoBackboneConfig = field(default_factory=CrocoBackboneConfig)
    pose_head: PoseHeadConfig = field(default_factory=PoseHeadConfig)
    opacity_mapping: OpacityMappingConfig = field(
        default_factory=OpacityMappingConfig
    )
    sh_degree: int = 4
    # DPT head sizes (shrink for tests; defaults match the reference).
    dpt_feature_dim: int = 256
    dpt_last_dim: int = 128
    dpt_layer_dims: tuple[int, ...] = (96, 192, 384, 768)
    estimating_pose: bool = True
    estimating_focal: bool = False
    pose_make_baseline_1: bool = False
    pose_make_relative: bool = True
    input_mean: float = 0.5
    input_std: float = 0.5
    # Rematerialize the full-resolution DPT heads: their conv activations
    # ((b, 256, 256, 256) f32 per head per view group) dominate peak HBM at
    # the flagship b=16 batch; the heads are cheap vs ViT-L to recompute.
    remat_heads: bool = True


class SPFSplatV2Encoder(nn.Module):
    cfg: SPFSplatV2Config = field(default_factory=SPFSplatV2Config)

    def _run_dual_heads(self, make_head, dec_feat, grid, extra=None):
        """Apply head1 to view 0 and head2 to views 1..v-1, batched.

        dec_feat: list of (b, v, p, c); returns (b, v, h', w', out).
        """
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
        context_valid: Optional[jax.Array] = None,  # (v_cxt,)
        target_valid: Optional[jax.Array] = None,   # (v_tgt,)
    ) -> dict:
        """`context_valid`/`target_valid` implement random view dropout with
        STATIC shapes (the reference slices the batch instead,
        model_wrapper.py:91-116, which would recompile per shape): dropped
        views are removed from attention memory and contribute
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
        images = (images - cfg.input_mean) / cfg.input_std

        view_valid = None
        if context_valid is not None or target_valid is not None:
            cv = (jnp.ones((v_cxt,)) if context_valid is None
                  else context_valid.astype(jnp.float32))
            tv = (jnp.ones((v_tgt,)) if target_valid is None
                  else target_valid.astype(jnp.float32))
            view_valid = jnp.concatenate([cv, tv]) if v_tgt else cv

        out = MaskedCrocoBackbone(cfg.backbone, name="backbone")(
            images, intrinsics, num_target=v_tgt, view_valid=view_valid
        )
        dec_feat, pose_feat, grid = out["dec_feat"], out["pose_feat"], out["grid"]
        ctx_feat = [t[:, :v_cxt] for t in dec_feat]

        # ---- pointmap heads (context views only) -------------------------
        # static_argnums counts self at 0: `grid` (a static (gh, gw) tuple)
        # is positional 2 for DPTHead, and `image` stays traced for
        # DPTGSHead (positional 3 is the array).
        pts_cls = (
            nn.remat(DPTHead, static_argnums=(2,))
            if cfg.remat_heads else DPTHead
        )
        gs_cls = (
            nn.remat(DPTGSHead, static_argnums=(2,))
            if cfg.remat_heads else DPTGSHead
        )
        raw_pts = self._run_dual_heads(
            lambda s: pts_cls(
                out_channels=3, feature_dim=cfg.dpt_feature_dim,
                last_dim=cfg.dpt_last_dim, layer_dims=cfg.dpt_layer_dims,
                out_bias=(0.0, 0.0, 1.2),  # from-scratch: points start ~z=2.3
                name=f"downstream_head{s}",
            ),
            ctx_feat, grid,
        )
        pts3d = pts3d_postprocess(raw_pts, mode="exp")  # (b, v_cxt, h, w, 3)

        # ---- Gaussian parameter heads (context views only) ---------------
        gs_dim = raw_gaussian_channels(cfg.sh_degree)
        ctx_images_norm = images[:, :v_cxt]
        raw_gs = self._run_dual_heads(
            lambda s: gs_cls(
                out_channels=gs_dim, feature_dim=cfg.dpt_feature_dim,
                layer_dims=cfg.dpt_layer_dims,
                name=f"gaussian_param_head{s}",
            ),
            ctx_feat, grid, extra=ctx_images_norm,
        )  # (b, v_cxt, h, w, 83)

        # ---- pose heads (context + target views) -------------------------
        extrinsics_c = extrinsics_cwt = None
        if cfg.estimating_pose:
            tokens = pose_feat[-1]  # (b, v, 1, c)
            v = tokens.shape[1]
            p1 = PoseHead(cfg.pose_head, name="pose_head1")(tokens[:, 0])
            p2 = PoseHead(cfg.pose_head, name="pose_head2")(
                tokens[:, 1:].reshape(b * (v - 1), 1, -1)
            )
            enc = jnp.concatenate(
                [p1[:, None], p2.reshape(b, v - 1, 9)], axis=1
            )  # (b, v, 9)
            poses = self._process_pose(enc, v_cxt)
            extrinsics_c = poses[:, :v_cxt]
            extrinsics_cwt = poses

        # ---- assemble Gaussians ------------------------------------------
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
        ).flatten_views()  # (b, v_cxt * h * w, ...)

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
        }
        if cfg.estimating_focal:
            # Weiszfeld focal from view-0's pointmap (camera-0 frame == world
            # frame after relative normalization), broadcast to every view
            # (reference encoder_spfsplatv2.py:289-290, 331-335).
            from spfsplatv2_tpu.geometry.intrinsics import estimate_intrinsics

            k_pred = estimate_intrinsics(pts3d)  # (b, 3, 3) normalized
            out["intrinsics_cwt"] = jnp.broadcast_to(
                k_pred[:, None], (b, v_cxt + v_tgt, 3, 3)
            )
        return out

    def _process_pose(self, pose_enc: jax.Array, v_cxt: int) -> jax.Array:
        """9D encodings -> c2w poses, baseline-1/relative normalization.

        Reference: encoder_spfsplatv2.py:340-359.
        """
        poses = se3.pose_encoding_to_matrix(pose_enc)  # (b, v, 4, 4)
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
