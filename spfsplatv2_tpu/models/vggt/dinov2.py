"""DINOv2 ViT feature extractor (the VGGT "patch embed") in flax.

TPU-native re-implementation of the vendored DINOv2 vision transformer
(reference: src/model/encoder/backbone/vggt/layers/vision_transformer.py):
conv patch embed (14x14), cls token + learned position embedding (bicubic
resize for non-native resolutions), `num_register_tokens` register tokens,
24 pre-norm blocks with LayerScale (init 1.0, no qk-norm, no RoPE), final
LayerNorm; returns `x_norm_patchtokens`.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from spfsplatv2_tpu.models.vggt.layers import VGGTBlock


@dataclass(frozen=True)
class DinoV2Config:
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    native_grid: int = 37  # 518 / 14, the pretraining grid for pos embed
    init_values: float = 1.0
    compute_dtype: str = "bfloat16"

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


class DinoV2(nn.Module):
    cfg: DinoV2Config = DinoV2Config()

    @nn.compact
    def __call__(self, images, extra_token=None):
        """images (b, h, w, 3) normalized -> patch tokens (b, p, c).

        `extra_token` (b, 1, c) is appended to the sequence when given (the
        encoder-side intrinsics embedding hook).
        """
        cfg = self.cfg
        cdt = cfg.dtype
        b, h, w, _ = images.shape
        p = cfg.patch_size
        gh, gw = h // p, w // p

        x = nn.Conv(
            cfg.embed_dim, (p, p), strides=(p, p), dtype=cdt, name="patch_embed"
        )(images.astype(cdt))
        x = x.reshape(b, gh * gw, cfg.embed_dim)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.embed_dim)
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, cfg.native_grid * cfg.native_grid + 1, cfg.embed_dim),
        )
        register_tokens = self.param(
            "register_tokens",
            nn.initializers.zeros,
            (1, cfg.num_register_tokens, cfg.embed_dim),
        )

        # Interpolate the patch position embedding to this grid
        # (reference interpolate_pos_encoding).
        cls_pos = pos_embed[:, :1]
        patch_pos = pos_embed[:, 1:].reshape(
            1, cfg.native_grid, cfg.native_grid, cfg.embed_dim
        )
        if (gh, gw) != (cfg.native_grid, cfg.native_grid):
            patch_pos = jax.image.resize(
                patch_pos, (1, gh, gw, cfg.embed_dim), method="bicubic"
            )
        patch_pos = patch_pos.reshape(1, gh * gw, cfg.embed_dim)

        x = x + patch_pos
        cls = jnp.broadcast_to(cls_token + cls_pos, (b, 1, cfg.embed_dim))
        regs = jnp.broadcast_to(
            register_tokens, (b, cfg.num_register_tokens, cfg.embed_dim)
        )
        tokens = [cls, regs, x]
        if extra_token is not None:
            tokens.append(extra_token)
        x = jnp.concatenate(tokens, axis=1)

        for i in range(cfg.depth):
            x = VGGTBlock(
                cfg.num_heads, cfg.mlp_ratio, qk_norm=False,
                init_values=cfg.init_values, rope_base=None,
                compute_dtype=cdt, name=f"blocks_{i}",
            )(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        start = 1 + cfg.num_register_tokens
        return x[:, start: start + gh * gw]
