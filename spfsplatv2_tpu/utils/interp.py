"""Bilinear resize with torch-style align_corners semantics.

`jax.image.resize` only implements half-pixel-center sampling, but the
reference DPT heads use `F.interpolate(..., align_corners=True)` throughout
(reference: src/model/encoder/heads/dpt_block.py Interpolate /
FeatureFusionBlock). Converted checkpoints only reproduce reference outputs
with matching sampling, so this implements both conventions explicitly as
two gather+lerp passes (cheap, fuses well under XLA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_coords(in_size: int, out_size: int, align_corners: bool, dtype):
    if align_corners and out_size > 1:
        return jnp.linspace(0.0, in_size - 1, out_size, dtype=dtype)
    scale = in_size / out_size
    coords = (jnp.arange(out_size, dtype=dtype) + 0.5) * scale - 0.5
    return jnp.clip(coords, 0.0, in_size - 1)


def _interp_axis(x: jax.Array, out_size: int, axis: int, align_corners: bool):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    coords = _axis_coords(in_size, out_size, align_corners, jnp.float32)
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    frac = (coords - lo).astype(x.dtype)
    x_lo = jnp.take(x, lo, axis=axis)
    x_hi = jnp.take(x, hi, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    frac = frac.reshape(shape)
    return x_lo * (1 - frac) + x_hi * frac


def resize_bilinear(
    x: jax.Array, out_hw: tuple[int, int], align_corners: bool = True
) -> jax.Array:
    """Resize (..., h, w, c) NHWC-style tensors bilinearly."""
    x = _interp_axis(x, out_hw[0], x.ndim - 3, align_corners)
    return _interp_axis(x, out_hw[1], x.ndim - 2, align_corners)
