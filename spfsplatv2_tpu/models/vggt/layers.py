"""VGGT/DINOv2-style transformer layers in flax.

TPU-native re-implementation of the vendored Meta layers
(reference: src/model/encoder/backbone/vggt/layers/{attention.py, block.py,
layer_scale.py, mlp.py}): pre-norm blocks with optional per-head-dim QK
LayerNorm, LayerScale residual scaling (init 0.01 in the aggregator, 1.0 in
DINOv2), RoPE-100 on patch tokens (special tokens sit at position 0), and
additive attention masks for the context->target block mask. The fused
`F.scaled_dot_product_attention` (N4 in SURVEY.md) maps to ops/attention.py
sdpa: the Pallas flash kernel for long unmasked (global-attention)
sequences, a dense einsum-softmax (which XLA fuses) otherwise.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from spfsplatv2_tpu.ops.attention import sdpa, sdpa_view_masked
from spfsplatv2_tpu.ops.rope import rope_2d


class VGGTAttention(nn.Module):
    num_heads: int
    qk_norm: bool = True
    rope_base: Optional[float] = 100.0
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, pos=None, mask=None):
        """x (b, n, c); pos (b, n, 2) or None; mask additive (..., n, n)."""
        b, n, c = x.shape
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.compute_dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        if self.qk_norm:
            q = nn.LayerNorm(dtype=jnp.float32, name="q_norm")(q).astype(
                self.compute_dtype
            )
            k = nn.LayerNorm(dtype=jnp.float32, name="k_norm")(k).astype(
                self.compute_dtype
            )
        if self.rope_base is not None and pos is not None:
            q = rope_2d(q, pos, self.rope_base)
            k = rope_2d(k, pos, self.rope_base)
        if mask is None:
            # Unmasked path: fused flash kernel for long sequences, dense
            # MXU form otherwise (ops/attention.py).
            out = sdpa(q, k, v, hd**-0.5)
        elif isinstance(mask, tuple):
            # (view_mask (v, v), tokens_per_view): query-chunked masked
            # attention for long sequences, dense below the threshold.
            view_mask, tokens_per_view = mask
            out = sdpa_view_masked(
                q, k, v, hd**-0.5, view_mask, tokens_per_view
            )
        else:
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
            logits = logits * (hd**-0.5)
            logits = logits + mask
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.compute_dtype, name="proj")(out)


class LayerScale(nn.Module):
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma",
            lambda key, shape: jnp.full(shape, self.init_value, jnp.float32),
            (x.shape[-1],),
        )
        return x * gamma


class VGGTBlock(nn.Module):
    """Pre-norm attention + MLP with LayerScale (reference block.py:27-108)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qk_norm: bool = True
    init_values: Optional[float] = 0.01
    rope_base: Optional[float] = 100.0
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, pos=None, mask=None):
        c = x.shape[-1]
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        attn = VGGTAttention(
            self.num_heads, self.qk_norm, self.rope_base, self.compute_dtype,
            name="attn",
        )(h.astype(self.compute_dtype), pos, mask)
        if self.init_values is not None:
            attn = LayerScale(self.init_values, name="ls1")(attn)
        x = x + attn
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.compute_dtype, name="mlp_fc1")(
            h.astype(self.compute_dtype)
        )
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.compute_dtype, name="mlp_fc2")(y)
        if self.init_values is not None:
            y = LayerScale(self.init_values, name="ls2")(y)
        return x + y
