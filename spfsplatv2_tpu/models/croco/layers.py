"""CroCo/DUSt3R-style ViT building blocks in flax.linen.

TPU-native re-implementation of the reference torch blocks
(reference: src/model/encoder/backbone/croco/blocks.py:17-253):
pre-norm attention + MLP encoder blocks, decoder blocks with
self-attention -> cross-attention -> MLP, RoPE2D positional rotation inside
attention, and a conv patch embed. Dense attention is left to XLA (sequence
lengths are <= a few thousand tokens; the MXU-friendly einsum formulation is
faster than any hand-scheduling at this size). Computation runs in
`compute_dtype` (bfloat16 by default) with float32 params and float32
softmax accumulation.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from spfsplatv2_tpu.ops.attention import sdpa
from spfsplatv2_tpu.ops.rope import rope_2d


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: Optional[int] = None
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.compute_dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(out_dim, dtype=self.compute_dtype, name="fc2")(x)
        return x


def _attention(q, k, v, scale):
    """Heads-first attention with f32 softmax: (b, h, n, d) inputs.

    Dispatches to the fused TPU flash kernel for long unmasked sequences
    (ops/attention.py), like the reference's torch F.scaled_dot_product_
    attention dispatch (croco/blocks.py:82-115).
    """
    return sdpa(q, k, v, scale)


class SelfAttention(nn.Module):
    """RoPE self-attention (reference blocks.py:82-115)."""

    num_heads: int
    rope_base: Optional[float] = 100.0
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, xpos):
        b, n, c = x.shape
        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.compute_dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # each (b, n, h, d)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        if self.rope_base is not None:
            q = rope_2d(q, xpos, self.rope_base)
            k = rope_2d(k, xpos, self.rope_base)
        out = _attention(q, k, v, head_dim**-0.5)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.compute_dtype, name="proj")(out)


class CrossAttention(nn.Module):
    """RoPE cross-attention (reference blocks.py:133-179)."""

    num_heads: int
    rope_base: Optional[float] = 100.0
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, query, key, value, qpos, kpos):
        b, nq, c = query.shape
        head_dim = c // self.num_heads

        def split(x, name):
            y = nn.Dense(c, dtype=self.compute_dtype, name=name)(x)
            return y.reshape(b, -1, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q = split(query, "projq")
        k = split(key, "projk")
        v = split(value, "projv")
        if self.rope_base is not None:
            q = rope_2d(q, qpos, self.rope_base)
            k = rope_2d(k, kpos, self.rope_base)
        out = _attention(q, k, v, head_dim**-0.5)
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, c)
        return nn.Dense(c, dtype=self.compute_dtype, name="proj")(out)


class EncoderBlock(nn.Module):
    """Pre-norm ViT block (reference blocks.py:117-131)."""

    num_heads: int
    mlp_ratio: float = 4.0
    rope_base: Optional[float] = 100.0
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, xpos):
        dim = x.shape[-1]
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        x = x + SelfAttention(
            self.num_heads, self.rope_base, self.compute_dtype, name="attn"
        )(h.astype(self.compute_dtype), xpos)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        x = x + Mlp(
            int(dim * self.mlp_ratio), compute_dtype=self.compute_dtype, name="mlp"
        )(h.astype(self.compute_dtype))
        return x


class DecoderBlock(nn.Module):
    """Self-attn -> cross-attn -> MLP block (reference blocks.py:181-203)."""

    num_heads: int
    mlp_ratio: float = 4.0
    rope_base: Optional[float] = 100.0
    norm_mem: bool = True
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, memory, xpos, mempos):
        dim = x.shape[-1]
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        x = x + SelfAttention(
            self.num_heads, self.rope_base, self.compute_dtype, name="attn"
        )(h.astype(self.compute_dtype), xpos)
        if self.norm_mem:
            mem = nn.LayerNorm(dtype=jnp.float32, name="norm_y")(memory)
        else:
            mem = memory
        mem = mem.astype(self.compute_dtype)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        x = x + CrossAttention(
            self.num_heads, self.rope_base, self.compute_dtype, name="cross_attn"
        )(h.astype(self.compute_dtype), mem, mem, xpos, mempos)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm3")(x)
        x = x + Mlp(
            int(dim * self.mlp_ratio), compute_dtype=self.compute_dtype, name="mlp"
        )(h.astype(self.compute_dtype))
        return x


class PatchEmbed(nn.Module):
    """Conv patch embed + integer (y, x) positions.

    Reference: src/model/encoder/backbone/croco/blocks.py:222-253 /
    patch_embed.py (PatchEmbedDust3R).
    """

    patch_size: int
    embed_dim: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images):
        """images (b, h, w, 3) -> (tokens (b, n, c), positions (b, n, 2))."""
        b, h, w, _ = images.shape
        p = self.patch_size
        assert h % p == 0 and w % p == 0, f"image {h}x{w} not divisible by {p}"
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), dtype=self.compute_dtype,
            name="proj",
        )(images.astype(self.compute_dtype))
        gh, gw = h // p, w // p
        x = x.reshape(b, gh * gw, self.embed_dim)
        yy, xx = jnp.meshgrid(
            jnp.arange(gh, dtype=jnp.int32), jnp.arange(gw, dtype=jnp.int32),
            indexing="ij",
        )
        pos = jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)
        pos = jnp.broadcast_to(pos[None], (b, gh * gw, 2))
        return x, pos


class ManyARPatchEmbed(nn.Module):
    """Mixed portrait/landscape patch embed (ManyAR).

    Reference: src/model/encoder/backbone/croco/patch_embed.py:33-71
    (ManyAR_PatchEmbed): every image is STORED landscape (w >= h buffer);
    `true_shapes (b, 2)` gives each image's real (height, width).  Portrait
    images are embedded from the transposed buffer with transposed (y, x)
    RoPE positions.

    TPU-native twist: instead of boolean-mask splitting the batch (dynamic
    shapes -> recompile per portrait/landscape mix), BOTH orientations are
    patchified with the shared conv (patchify is <1% of backbone FLOPs) and
    per-image `jnp.where` selects the right tokens/positions — one static
    program for every mix.
    """

    patch_size: int
    embed_dim: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images, true_shapes):
        """(b, h, w, 3) landscape buffers + (b, 2) true (h, w) ->
        tokens (b, n, c), positions (b, n, 2)."""
        b, h, w, _ = images.shape
        p = self.patch_size
        assert w >= h, f"ManyAR buffers must be landscape, got {h}x{w}"
        assert h % p == 0 and w % p == 0, f"image {h}x{w} not divisible by {p}"
        gh, gw = h // p, w // p
        conv = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), dtype=self.compute_dtype,
            name="proj",
        )
        x_land = conv(images.astype(self.compute_dtype))        # (b, gh, gw, c)
        x_port = conv(
            jnp.swapaxes(images, 1, 2).astype(self.compute_dtype)
        )                                                       # (b, gw, gh, c)
        n = gh * gw
        x_land = x_land.reshape(b, n, self.embed_dim)
        x_port = x_port.reshape(b, n, self.embed_dim)

        def grid(a, bdim):
            yy, xx = jnp.meshgrid(
                jnp.arange(a, dtype=jnp.int32),
                jnp.arange(bdim, dtype=jnp.int32),
                indexing="ij",
            )
            return jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)

        pos_land = jnp.broadcast_to(grid(gh, gw)[None], (b, n, 2))
        pos_port = jnp.broadcast_to(grid(gw, gh)[None], (b, n, 2))

        is_landscape = (
            true_shapes[:, 1] >= true_shapes[:, 0]
        )[:, None, None]
        x = jnp.where(is_landscape, x_land, x_port)
        pos = jnp.where(is_landscape, pos_land, pos_port)
        return x, pos
