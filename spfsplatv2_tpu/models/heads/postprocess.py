"""Pointmap head postprocessing.

Reference: src/model/encoder/heads/postprocess.py:11-64 — the "exp"
parameterization used by the flagship config: the raw 3-channel output is
split into a unit direction and a distance passed through expm1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pts3d_postprocess(raw_xyz: jax.Array, mode: str = "exp") -> jax.Array:
    """(..., 3) raw head output -> (..., 3) 3D points."""
    if mode == "linear":
        return raw_xyz
    d = jnp.linalg.norm(raw_xyz, axis=-1, keepdims=True)
    direction = raw_xyz / jnp.maximum(d, 1e-8)
    if mode == "exp":
        return direction * jnp.expm1(d)
    if mode == "square":
        return direction * d**2
    raise ValueError(f"bad pts3d mode {mode!r}")
