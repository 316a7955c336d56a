"""Unmasked multi-view CroCo backbone (the v1 / ICCV-SPFSplat core).

TPU-native re-design of `AsymmetricCroCoMulti`
(reference: src/model/encoder/backbone/backbone_croco_multiview.py:61-282):

  * ViT-L encoder (24 blocks, 1024d, RoPE-100) shared across views, with the
    per-view intrinsics token appended at the ENCODER input (v2 appends it at
    the decoder instead) at grid position (gh, 0)
    (reference `_encode_image`, backbone_croco_multiview.py:158-175).
  * Dual 12-block 768d decoders (`dec_blocks` for view 0, `dec_blocks2` for
    the rest); every view cross-attends to all OTHER views' tokens with no
    context/target masking (reference `generate_ctx_views` + `_decoder`,
    lines 166-209).
  * Instead of a mask, target isolation comes from running the decoder
    TWICE: once over context views only (feeds pointmap/Gaussian/context
    pose heads) and once over context+target views (feeds the pose head for
    all views) — reference `forward` steps 2-3, lines 241-253.

Shares all building blocks with the masked v2 backbone (croco/backbone.py);
the cross-view attention uses the same single batched masked attention with
only the diagonal (self-view) blocked.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from flax import linen as nn

from spfsplatv2_tpu.models.croco.backbone import (
    MultiViewDecoderBlock,
    build_cross_view_mask,
)
from spfsplatv2_tpu.models.croco.layers import EncoderBlock, PatchEmbed


@dataclass(frozen=True)
class CrocoMultiBackboneConfig:
    """ViTLarge_BaseDecoder, intrinsics token @ encoder
    (reference config/model/encoder/backbone/croco_multi.yaml)."""

    patch_size: int = 16
    enc_depth: int = 24
    enc_embed_dim: int = 1024
    enc_num_heads: int = 16
    dec_depth: int = 12
    dec_embed_dim: int = 768
    dec_num_heads: int = 12
    mlp_ratio: float = 4.0
    rope_base: float = 100.0
    intrinsics_token: bool = True
    compute_dtype: str = "bfloat16"
    remat: bool = True  # see CrocoBackboneConfig.remat

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


class CrocoMultiBackbone(nn.Module):
    cfg: CrocoMultiBackboneConfig = field(
        default_factory=CrocoMultiBackboneConfig
    )

    def setup(self):
        cfg = self.cfg
        cdt = cfg.dtype
        self.patch_embed = PatchEmbed(
            cfg.patch_size, cfg.enc_embed_dim, cdt, name="patch_embed"
        )
        if cfg.intrinsics_token:
            self.intrinsic_encoder = nn.Dense(
                cfg.enc_embed_dim, name="intrinsic_encoder"
            )
        enc_cls = nn.remat(EncoderBlock) if cfg.remat else EncoderBlock
        dec_cls = (
            nn.remat(MultiViewDecoderBlock) if cfg.remat
            else MultiViewDecoderBlock
        )
        self.enc_blocks = [
            enc_cls(
                cfg.enc_num_heads, cfg.mlp_ratio, cfg.rope_base, cdt,
                name=f"enc_blocks_{i}",
            )
            for i in range(cfg.enc_depth)
        ]
        self.enc_norm = nn.LayerNorm(dtype=jnp.float32, name="enc_norm")
        self.decoder_embed = nn.Dense(cfg.dec_embed_dim, name="decoder_embed")
        self.dec_blocks = [
            dec_cls(
                cfg.dec_num_heads, cfg.mlp_ratio, cfg.rope_base,
                lo=0, hi=1, compute_dtype=cdt, name=f"dec_blocks_{i}",
            )
            for i in range(cfg.dec_depth)
        ]
        self.dec_blocks2 = [
            dec_cls(
                cfg.dec_num_heads, cfg.mlp_ratio, cfg.rope_base,
                lo=1, hi=None, compute_dtype=cdt, name=f"dec_blocks2_{i}",
            )
            for i in range(cfg.dec_depth)
        ]
        self.dec_norm = nn.LayerNorm(dtype=jnp.float32, name="dec_norm")

    def _decode(self, x, pos, p):
        """Run the dual unmasked decoder over a view subset.

        x (b, v, l, c_enc); returns list [enc_feat, dec_1..dec_D] with
        patch tokens only ((b, v, p, c), float32).
        """
        v = x.shape[1]
        # Diagonal-only mask: every view attends to all OTHER views.
        view_mask = build_cross_view_mask(v, 0)
        outputs = [x]
        f = self.decoder_embed(x)
        for blk1, blk2 in zip(self.dec_blocks, self.dec_blocks2):
            f0 = blk1(f, pos, view_mask)
            f_rest = blk2(f, pos, view_mask)
            f = jnp.concatenate([f0, f_rest], axis=1)
            outputs.append(f)
        outputs[-1] = self.dec_norm(outputs[-1])
        return [o[:, :, :p].astype(jnp.float32) for o in outputs]

    def __call__(self, images, intrinsics=None, num_target=0):
        """
        images:     (b, v, h, w, 3) normalized to [-1, 1]
        intrinsics: (b, v, 3, 3) normalized; required if cfg.intrinsics_token
        num_target: static int; the trailing views are targets.

        Returns dict:
          dec_feat:       context-only decoder pass, list of (b, v_cxt, p, c)
          dec_feat_w_tgt: all-views decoder pass (None if num_target == 0)
          grid:           (gh, gw)
        """
        cfg = self.cfg
        b, v, h, w, _ = images.shape
        gh, gw = h // cfg.patch_size, w // cfg.patch_size
        p = gh * gw
        v_cxt = v - num_target

        x, pos = self.patch_embed(images.reshape(b * v, h, w, 3))
        if cfg.intrinsics_token:
            assert intrinsics is not None
            tok = self.intrinsic_encoder(intrinsics.reshape(b * v, 1, 9))
            x = jnp.concatenate([x, tok.astype(x.dtype)], axis=1)
            # Token position (gh, 0): one row below the last patch row
            # (reference backbone_croco_multiview.py:169-172).
            extra_pos = jnp.broadcast_to(
                jnp.asarray([[gh, 0]], jnp.int32)[None], (b * v, 1, 2)
            )
            pos = jnp.concatenate([pos, extra_pos], axis=1)
        for blk in self.enc_blocks:
            x = blk(x, pos)
        x = self.enc_norm(x)

        l = x.shape[1]
        x = x.reshape(b, v, l, cfg.enc_embed_dim)
        pos = pos.reshape(b, v, l, 2)

        dec_feat = self._decode(x[:, :v_cxt], pos[:, :v_cxt], p)
        dec_feat_w_tgt = None
        if num_target:
            dec_feat_w_tgt = self._decode(x, pos, p)
        return {
            "dec_feat": dec_feat,
            "dec_feat_w_tgt": dec_feat_w_tgt,
            "grid": (gh, gw),
        }
