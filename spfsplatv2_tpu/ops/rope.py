"""2D rotary position embeddings (RoPE2D), pure JAX.

TPU-native replacement for the reference's cuRoPE2D CUDA kernel
(reference: src/model/encoder/backbone/croco/curope/kernels.cu:17-108) and
its torch fallback (src/model/encoder/backbone/croco/pos_embed.py:106-159).
On TPU the elementwise rotate fuses into the surrounding attention matmuls
under XLA, so no custom kernel is needed; semantics match the reference:
the feature dim is split into a y-half and an x-half, each rotated by a 1D
RoPE keyed on the integer (y, x) token position, using the "rotate-half"
(concatenated, not interleaved) layout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _rope_1d(tokens: jax.Array, pos: jax.Array, base: float) -> jax.Array:
    """tokens (..., n, d) with d even; pos (..., n) integer positions."""
    d = tokens.shape[-1]
    half = d // 2
    inv_freq = 1.0 / (base ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    ang = pos[..., None].astype(jnp.float32) * inv_freq  # (..., n, half)
    cos = jnp.cos(ang).astype(tokens.dtype)
    sin = jnp.sin(ang).astype(tokens.dtype)
    cos = jnp.concatenate([cos, cos], axis=-1)
    sin = jnp.concatenate([sin, sin], axis=-1)
    x1, x2 = tokens[..., :half], tokens[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return tokens * cos + rotated * sin


@partial(jax.jit, static_argnames=("base",))
def rope_2d(tokens: jax.Array, positions: jax.Array, base: float = 100.0) -> jax.Array:
    """Apply 2D RoPE.

    tokens:    (b, heads, n, d) with d % 4 == 0
    positions: (b, n, 2) integer (y, x) per token
    """
    d = tokens.shape[-1]
    assert d % 4 == 0, "RoPE2D needs head_dim divisible by 4"
    y_tok, x_tok = tokens[..., : d // 2], tokens[..., d // 2:]
    y_pos = positions[..., None, :, 0]  # broadcast over heads
    x_pos = positions[..., None, :, 1]
    return jnp.concatenate(
        [_rope_1d(y_tok, y_pos, base), _rope_1d(x_tok, x_pos, base)], axis=-1
    )
