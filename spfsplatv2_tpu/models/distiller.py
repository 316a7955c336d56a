"""DUSt3R teacher for pointmap distillation.

TPU-native port of the reference distiller (reference: src/model/distiller/
dust3r_backbone.py:170-210, loaded via get_distiller): a frozen pairwise
DUSt3R predicts pts3d + confidence pseudo-ground-truth for the two context
views during the first `distill_max_steps` steps of training.

Architecturally DUSt3R is exactly our masked CroCo backbone at v=2 with no
extra tokens (each view cross-attends to the other view only) plus per-view
DPT heads that also emit a confidence channel, so this module composes those
pieces instead of duplicating them.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from spfsplatv2_tpu.geometry.pointcloud import normalize_pointcloud
from spfsplatv2_tpu.models.croco.backbone import (
    CrocoBackboneConfig,
    MaskedCrocoBackbone,
)
from spfsplatv2_tpu.models.encoder import dpt_hooks
from spfsplatv2_tpu.models.heads.dpt import DPTHead
from spfsplatv2_tpu.models.heads.postprocess import pts3d_postprocess


@dataclass(frozen=True)
class DistillerConfig:
    backbone: CrocoBackboneConfig = field(
        default_factory=lambda: CrocoBackboneConfig(
            intrinsics_token=False, pose_token=False
        )
    )
    conf_mode: str = "exp"  # reg_dense_conf 'exp' with vmin 1


class Dust3RDistiller(nn.Module):
    cfg: DistillerConfig = field(default_factory=DistillerConfig)

    @nn.compact
    def __call__(self, images: jax.Array, normalize: bool = True):
        """images (b, 2, h, w, 3) in [0, 1] -> dict with pts3d (b, 2, h, w, 3)
        in view-0's frame and conf (b, 2, h, w)."""
        b, v, h, w, _ = images.shape
        assert v == 2, "DUSt3R teacher is pairwise"
        normed = images * 2.0 - 1.0

        out = MaskedCrocoBackbone(self.cfg.backbone, name="backbone")(
            normed, None, num_target=0
        )
        dec_feat, grid = out["dec_feat"], out["grid"]
        hooked = [dec_feat[i] for i in dpt_hooks(len(dec_feat) - 1)]

        results = []
        for view, name in ((0, "downstream_head1"), (1, "downstream_head2")):
            tokens = [t[:, view] for t in hooked]
            raw = DPTHead(out_channels=4, name=name)(tokens, grid)
            pts = pts3d_postprocess(raw[..., :3], "exp")
            # reg_dense_conf 'exp': 1 + exp(x) clipped (postprocess.py conf).
            conf = 1.0 + jnp.exp(jnp.minimum(raw[..., 3], 10.0))
            results.append((pts, conf))

        pts1, conf1 = results[0]
        pts2, conf2 = results[1]
        if normalize:
            pts1, pts2, _ = normalize_pointcloud(pts1, pts2, "avg_dis")
        return {
            "pts3d": jnp.stack([pts1, pts2], axis=1),
            "conf": jnp.stack([conf1, conf2], axis=1),
        }
