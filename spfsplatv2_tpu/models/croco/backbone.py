"""Masked multi-view CroCo backbone (the reference's architectural core).

TPU-native re-design of `AsymmetricMaskedCroCoMulti`
(reference: src/model/encoder/backbone/backbone_masked_croco.py:62-405):

  * ViT-L encoder (24 blocks, 1024d, 16 heads, RoPE-100) shared across views.
  * Dual 12-block 768d decoders: `dec_blocks` processes view 0, `dec_blocks2`
    all other views (the DUSt3R/MASt3R asymmetry).
  * Each decoder block self-attends within a view, then cross-attends to the
    tokens of all *other* views, with the context<->target mask: context
    views may only attend to other context views; target views attend to
    everything except themselves.
  * Optional per-view intrinsics token (Linear 9 -> 1024) and learnable pose
    token are appended at the decoder input; the pose token stream is
    returned separately for the pose head.

TPU-first design choice: instead of materializing per-view "all other views"
memory copies and running (v) separate cross-attentions (the reference's
mask-v2 slicing, backbone_masked_croco.py:277-302), cross-attention K/V are
projected ONCE per view and a single batched attention over the concatenated
(v * L) token axis applies an additive block mask built from the
context/target split. This keeps one compiled XLA graph for every
(v_cxt, v_tgt) partition at a fixed total view count, removes the duplicated
K/V projection work (the reference re-projects every view's tokens v-1
times), and maps onto the MXU as a few large matmuls.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from spfsplatv2_tpu.models.croco.layers import (
    EncoderBlock,
    ManyARPatchEmbed,
    Mlp,
    PatchEmbed,
    SelfAttention,
)
from spfsplatv2_tpu.ops.attention import sdpa_view_masked
from spfsplatv2_tpu.ops.rope import rope_2d


@dataclass(frozen=True)
class CrocoBackboneConfig:
    """ViTLarge_BaseDecoder (reference backbone_masked_croco.py:20-31)."""

    patch_size: int = 16
    enc_depth: int = 24
    enc_embed_dim: int = 1024
    enc_num_heads: int = 16
    dec_depth: int = 12
    dec_embed_dim: int = 768
    dec_num_heads: int = 12
    mlp_ratio: float = 4.0
    rope_base: float = 100.0
    intrinsics_token: bool = True     # intrinsics_embed_type: token @ decoder
    pose_token: bool = True           # pose_embed_type: learnable_token @ decoder
    compute_dtype: str = "bfloat16"
    # "dust3r" (square/landscape-only) or "manyar" (mixed portrait/landscape
    # via true_shapes; reference croco/patch_embed.py:33-71).
    patch_embed_cls: str = "dust3r"
    # Rematerialize transformer blocks in the backward pass (XLA remat):
    # trades ~30% extra forward FLOPs for O(depth) activation memory,
    # enabling the reference b=16 flagship training batch on one chip.
    remat: bool = True

    @property
    def num_extra_tokens(self) -> int:
        return int(self.intrinsics_token) + int(self.pose_token)

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


def build_cross_view_mask(
    v: int, num_target, view_valid=None, dtype=jnp.float32
) -> jax.Array:
    """(v, v) additive mask over view blocks.

    Entry (i, j) = 0 if query view i may attend to memory view j, else -inf.
    Rules (reference generate_masks, backbone_masked_croco.py:224-245):
      * no self-attention across the view axis (diagonal blocked),
      * context views (first v - num_target) cannot attend to target views.
    `num_target` may be a traced scalar so one compiled graph serves every
    context/target split of a fixed total view count.

    `view_valid` ((v,) bool/float, optional) marks DROPPED views (the
    shape-stable replacement for the reference's random view-dropout
    slicing, model_wrapper.py:91-116): invalid views are removed from every
    memory set so attention behaves exactly as if they were absent.
    """
    idx = jnp.arange(v)
    is_target_col = idx[None, :] >= (v - num_target)
    is_context_row = idx[:, None] < (v - num_target)
    blocked = jnp.eye(v, dtype=bool) | (is_context_row & is_target_col)
    if view_valid is not None:
        blocked = blocked | (~view_valid.astype(bool))[None, :]
    return jnp.where(blocked, jnp.asarray(-jnp.inf, dtype), jnp.asarray(0.0, dtype))


class MultiViewCrossAttention(nn.Module):
    """Cross-attention of a subset of query views over ALL views' tokens.

    K/V are projected once per memory view; a single masked attention over
    the concatenated (v * l) token axis applies the context/target rules.
    """

    num_heads: int
    rope_base: float
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, q_tokens, mem, qpos, mempos, qview_mask):
        """q_tokens (b, nq, l, c); mem (b, v, l, c); qview_mask (nq, v)."""
        b, nq, l, c = q_tokens.shape
        v = mem.shape[1]
        hd = c // self.num_heads

        def proj(t, n_views, name):
            y = nn.Dense(c, dtype=self.compute_dtype, name=name)(t)
            return y.reshape(b, n_views * l, self.num_heads, hd).transpose(
                0, 2, 1, 3
            )

        q = proj(q_tokens, nq, "projq")
        k = proj(mem, v, "projk")
        val = proj(mem, v, "projv")
        q = rope_2d(q, qpos.reshape(b, nq * l, 2), self.rope_base)
        k = rope_2d(k, mempos.reshape(b, v * l, 2), self.rope_base)

        # Dense einsum-softmax at flagship token counts; query-chunked with
        # per-chunk mask expansion for long sequences (ops/attention.py —
        # the masked analog of the fused-SDPA dispatch).
        out = sdpa_view_masked(
            q, k, val, hd**-0.5, qview_mask, l
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, l, c)
        return nn.Dense(c, dtype=self.compute_dtype, name="proj")(out)


class MultiViewDecoderBlock(nn.Module):
    """Self-attn (within view) + masked cross-attn (across views) + MLP.

    Equivalent per-view math to the reference DecoderBlock
    (croco/blocks.py:181-203) driven by the mask-v2 scheme.
    """

    num_heads: int
    mlp_ratio: float
    rope_base: float
    lo: int = 0
    hi: Optional[int] = None
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x_full, xpos, view_mask):
        """Process query views x_full[:, lo:hi] against full-view memory."""
        b, v, l, c = x_full.shape
        hi = v if self.hi is None else self.hi
        x = x_full[:, self.lo: hi]
        qpos = xpos[:, self.lo: hi]
        nq = hi - self.lo
        flat = lambda t: t.reshape(b * nq, l, -1)
        unflat = lambda t: t.reshape(b, nq, l, -1)

        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        x = x + unflat(
            SelfAttention(
                self.num_heads, self.rope_base, self.compute_dtype, name="attn"
            )(flat(h).astype(self.compute_dtype), flat(qpos))
        )
        # Memory is the previous layer's full output (cross-view tokens are
        # read pre-update, exactly like the reference's mask-v2 loop).
        mem = nn.LayerNorm(dtype=jnp.float32, name="norm_y")(x_full).astype(
            self.compute_dtype
        )
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        x = x + MultiViewCrossAttention(
            self.num_heads, self.rope_base, self.compute_dtype, name="cross_attn"
        )(h.astype(self.compute_dtype), mem, qpos, xpos, view_mask[self.lo: hi])
        h = nn.LayerNorm(dtype=jnp.float32, name="norm3")(x)
        x = x + Mlp(
            int(c * self.mlp_ratio), compute_dtype=self.compute_dtype, name="mlp"
        )(h.astype(self.compute_dtype))
        return x


class MaskedCrocoBackbone(nn.Module):
    """Full masked multi-view backbone; see module docstring."""

    cfg: CrocoBackboneConfig = field(default_factory=CrocoBackboneConfig)

    @nn.compact
    def __call__(self, images, intrinsics=None, num_target=0, view_valid=None,
                 true_shapes=None):
        """
        images:     (b, v, h, w, 3), already normalized to [-1, 1]
        intrinsics: (b, v, 3, 3) normalized; required if cfg.intrinsics_token
        num_target: int or traced scalar; trailing `num_target` views are
                    target views (context cannot attend to them).
        view_valid: (v,) optional bool/float; invalid (randomly dropped)
                    views are excluded from all attention memory sets.
        true_shapes: (b, v, 2) real (h, w) per view for the ManyAR embed
                    (cfg.patch_embed_cls == "manyar"); portrait views are
                    stored transposed in the landscape buffer.

        Returns dict:
          dec_feat:  list of (b, v, p, c) token maps — [encoder(1024d),
                     dec_1..dec_12(768d)], patch tokens only
          pose_feat: list of (b, v, 1, c) pose-token streams (same depth)
          grid:      (gh, gw) patch grid
        """
        cfg = self.cfg
        cdt = cfg.dtype
        b, v, h, w, _ = images.shape
        gh, gw = h // cfg.patch_size, w // cfg.patch_size
        p = gh * gw

        enc_block_cls = nn.remat(EncoderBlock) if cfg.remat else EncoderBlock
        dec_block_cls = (
            nn.remat(MultiViewDecoderBlock) if cfg.remat
            else MultiViewDecoderBlock
        )

        # ---- encoder (per view, shared weights) --------------------------
        if cfg.patch_embed_cls == "manyar":
            if true_shapes is None:
                true_shapes = jnp.broadcast_to(
                    jnp.asarray([h, w], jnp.int32), (b, v, 2)
                )
            x, pos = ManyARPatchEmbed(
                cfg.patch_size, cfg.enc_embed_dim, cdt, name="patch_embed"
            )(images.reshape(b * v, h, w, 3), true_shapes.reshape(b * v, 2))
        else:
            x, pos = PatchEmbed(
                cfg.patch_size, cfg.enc_embed_dim, cdt, name="patch_embed"
            )(images.reshape(b * v, h, w, 3))
        for i in range(cfg.enc_depth):
            x = enc_block_cls(
                cfg.enc_num_heads, cfg.mlp_ratio, cfg.rope_base, cdt,
                name=f"enc_blocks_{i}",
            )(x, pos)
        x = nn.LayerNorm(dtype=jnp.float32, name="enc_norm")(x)

        x = x.reshape(b, v, p, cfg.enc_embed_dim)
        pos = pos.reshape(b, v, p, 2)

        # ---- extra decoder-input tokens ----------------------------------
        # Positions follow the reference convention: appended tokens sit at
        # (gh, 0), (gh + 1, 0) (backbone_masked_croco.py:186-201).
        extra = []
        if cfg.intrinsics_token:
            assert intrinsics is not None
            tok = nn.Dense(cfg.enc_embed_dim, name="intrinsic_encoder")(
                intrinsics.reshape(b, v, 9)
            )
            extra.append(tok[:, :, None, :])
        if cfg.pose_token:
            pose_tok = self.param(
                "pose_token",
                nn.initializers.normal(1.0),
                (1, 1, 1, cfg.enc_embed_dim),
            )
            extra.append(jnp.broadcast_to(pose_tok, (b, v, 1, cfg.enc_embed_dim)))
        if extra:
            x = jnp.concatenate([x] + extra, axis=2)
            n_extra = len(extra)
            extra_pos = jnp.stack(
                [
                    jnp.stack(
                        [jnp.full((), gh + i, jnp.int32), jnp.zeros((), jnp.int32)]
                    )
                    for i in range(n_extra)
                ]
            )  # (n_extra, 2)
            pos = jnp.concatenate(
                [pos, jnp.broadcast_to(extra_pos[None, None], (b, v, n_extra, 2))],
                axis=2,
            )
        l = x.shape[2]

        # ---- dual masked decoder -----------------------------------------
        view_mask = build_cross_view_mask(v, num_target, view_valid)
        outputs = [x]  # pre-projection encoder features (1024d)
        f = nn.Dense(cfg.dec_embed_dim, name="decoder_embed")(x)
        for i in range(cfg.dec_depth):
            # Asymmetric decoders: view 0 through dec_blocks, the rest
            # through dec_blocks2 (reference lines 277-302); both read the
            # full previous-layer token set as cross-attention memory.
            f0 = dec_block_cls(
                cfg.dec_num_heads, cfg.mlp_ratio, cfg.rope_base,
                lo=0, hi=1, compute_dtype=cdt, name=f"dec_blocks_{i}",
            )(f, pos, view_mask)
            f_rest = dec_block_cls(
                cfg.dec_num_heads, cfg.mlp_ratio, cfg.rope_base,
                lo=1, hi=None, compute_dtype=cdt, name=f"dec_blocks2_{i}",
            )(f, pos, view_mask)
            f = jnp.concatenate([f0, f_rest], axis=1)
            outputs.append(f)
        outputs[-1] = nn.LayerNorm(dtype=jnp.float32, name="dec_norm")(outputs[-1])

        pose_feat = None
        if cfg.pose_token:
            pose_feat = [o[:, :, l - 1: l].astype(jnp.float32) for o in outputs]

        dec_feat = [o[:, :, :p].astype(jnp.float32) for o in outputs]
        return {
            "dec_feat": dec_feat,
            "pose_feat": pose_feat,
            "grid": (gh, gw),
        }
