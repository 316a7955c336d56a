"""VGGT Aggregator: alternating frame/global attention with target masking.

TPU-native re-implementation of the vendored Meta aggregator plus the
SPFSplatV2 masking fork (reference:
src/model/encoder/backbone/vggt/models/aggregator.py:27-369):

  * DINOv2 ViT-L/14 patch tokens (models/vggt/dinov2.py),
  * per-view special tokens: optional intrinsics token (Linear 9->C),
    a camera token and `num_register_tokens` register tokens, with separate
    learned parameters for the first frame vs the rest
    (`slice_expand_and_flatten`, aggregator.py:505-528),
  * `depth` pairs of (frame attention over each view's tokens, global
    attention over ALL views' tokens concatenated), RoPE on patch tokens
    (special tokens at position 0),
  * context->target masking applied to the GLOBAL attention only
    (frame attention is per-view so needs no mask): context rows cannot
    attend to target columns; unlike the CroCo path, self-attention within
    a view is allowed (aggregator.py:289-369),
  * outputs: per-layer concat(frame, global) token maps (b, v, p, 2C).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from flax import linen as nn

from spfsplatv2_tpu.models.vggt.dinov2 import DinoV2, DinoV2Config
from spfsplatv2_tpu.models.vggt.layers import VGGTBlock

RESNET_MEAN = (0.485, 0.456, 0.406)
RESNET_STD = (0.229, 0.224, 0.225)


@dataclass(frozen=True)
class AggregatorConfig:
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    qk_norm: bool = True
    rope_base: float = 100.0
    init_values: float = 0.01
    intrinsics_token: bool = True   # intrinsics_embed_loc='decoder'
    dinov2: DinoV2Config = field(default_factory=DinoV2Config)
    compute_dtype: str = "bfloat16"

    @property
    def num_special(self) -> int:
        # intrinsics? + camera + registers
        return int(self.intrinsics_token) + 1 + self.num_register_tokens

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


def global_view_mask_blocks(
    v: int, num_target, view_valid=None, dtype=jnp.float32
) -> jax.Array:
    """(v, v) additive VIEW-level mask: context rows cannot see target cols.

    `view_valid` ((v,) bool/float, optional) marks randomly DROPPED views
    (static-shape view dropout, mirroring the CroCo path): an invalid
    view's column is blocked for every row, so its tokens vanish from the
    global attention exactly as if the view had been sliced out
    (reference drops by slicing, model_wrapper.py:91-116; mask fork
    aggregator.py:289-369)."""
    idx = jnp.arange(v)
    is_target_col = idx[None, :] >= (v - num_target)
    is_context_row = idx[:, None] < (v - num_target)
    blocked = is_context_row & is_target_col
    if view_valid is not None:
        blocked = blocked | (~view_valid.astype(bool))[None, :]
    return jnp.where(
        blocked, jnp.asarray(-jnp.inf, dtype), jnp.asarray(0.0, dtype)
    )


def global_view_mask(v: int, p: int, num_target, dtype=jnp.float32) -> jax.Array:
    """(v*p, v*p) token-level expansion of global_view_mask_blocks."""
    mask = global_view_mask_blocks(v, num_target, dtype=dtype)
    return jnp.repeat(jnp.repeat(mask, p, axis=0), p, axis=1)


class VGGTAggregator(nn.Module):
    cfg: AggregatorConfig = field(default_factory=AggregatorConfig)

    @nn.compact
    def __call__(self, images, intrinsics=None, num_target=0, view_valid=None):
        """
        images: (b, v, h, w, 3) in [0, 1]; intrinsics (b, v, 3, 3) normalized.
        view_valid: (v,) optional bool/float; invalid (randomly dropped)
        views are removed from the global attention (see
        global_view_mask_blocks).
        Returns dict:
          tokens:  list of `depth` maps (b, v, p_total, 2C) concat(frame, global)
          patch_start: index of the first patch token
          grid: (gh, gw)
        """
        cfg = self.cfg
        cdt = cfg.dtype
        b, v, h, w, _ = images.shape
        gh, gw = h // cfg.patch_size, w // cfg.patch_size
        n_patch = gh * gw

        mean = jnp.asarray(RESNET_MEAN)
        std = jnp.asarray(RESNET_STD)
        images = (images - mean) / std

        patch_tokens = DinoV2(cfg.dinov2, name="patch_embed")(
            images.reshape(b * v, h, w, 3)
        )  # (b*v, p, C)

        # Special tokens: first-frame vs other-frame parameter rows
        # (aggregator.py:126-135 + slice_expand_and_flatten).
        camera_token = self.param(
            "camera_token", nn.initializers.normal(1e-6), (2, 1, cfg.embed_dim)
        )
        register_token = self.param(
            "register_token",
            nn.initializers.normal(1e-6),
            (2, cfg.num_register_tokens, cfg.embed_dim),
        )

        def expand_special(tok):
            first = jnp.broadcast_to(tok[0][None], (b, 1, *tok.shape[1:]))
            rest = jnp.broadcast_to(tok[1][None, None], (b, v - 1, *tok.shape[1:]))
            return jnp.concatenate([first, rest], axis=1).reshape(
                b * v, *tok.shape[1:]
            )

        specials = [expand_special(camera_token), expand_special(register_token)]
        if cfg.intrinsics_token:
            assert intrinsics is not None
            intr_tok = nn.Dense(cfg.embed_dim, name="intrinsic_encoder")(
                intrinsics.reshape(b * v, 9)
            )[:, None, :]
            specials = [intr_tok] + specials

        tokens = jnp.concatenate(specials + [patch_tokens], axis=1)
        p_total = tokens.shape[1]
        n_special = p_total - n_patch

        # Positions: patch tokens on the grid + 1; special tokens at 0.
        yy, xx = jnp.meshgrid(
            jnp.arange(gh, dtype=jnp.int32), jnp.arange(gw, dtype=jnp.int32),
            indexing="ij",
        )
        patch_pos = jnp.stack([yy.reshape(-1), xx.reshape(-1)], -1) + 1
        pos = jnp.concatenate(
            [jnp.zeros((n_special, 2), jnp.int32), patch_pos], axis=0
        )
        pos_frame = jnp.broadcast_to(pos[None], (b * v, p_total, 2))
        pos_global = jnp.broadcast_to(
            jnp.tile(pos, (v, 1))[None], (b, v * p_total, 2)
        )

        # VIEW-level mask + tokens-per-view: the attention layer expands it
        # per query chunk, never materializing the (v*p)^2 token mask.
        gmask = (global_view_mask_blocks(v, num_target, view_valid), p_total)

        outputs = []
        x = tokens
        for i in range(cfg.depth):
            # Frame attention: each view independently.
            x = VGGTBlock(
                cfg.num_heads, cfg.mlp_ratio, cfg.qk_norm, cfg.init_values,
                cfg.rope_base, cdt, name=f"frame_blocks_{i}",
            )(x, pos_frame)
            frame_out = x
            # Global attention: all views' tokens concatenated + mask.
            xg = x.reshape(b, v * p_total, cfg.embed_dim)
            xg = VGGTBlock(
                cfg.num_heads, cfg.mlp_ratio, cfg.qk_norm, cfg.init_values,
                cfg.rope_base, cdt, name=f"global_blocks_{i}",
            )(xg, pos_global, gmask)
            x = xg.reshape(b * v, p_total, cfg.embed_dim)
            outputs.append(
                jnp.concatenate([frame_out, x], axis=-1).reshape(
                    b, v, p_total, 2 * cfg.embed_dim
                ).astype(jnp.float32)
            )

        return {
            "tokens": outputs,
            "patch_start": n_special,
            "grid": (gh, gw),
        }
