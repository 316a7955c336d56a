"""Pointmap head postprocessing.

Reference: src/model/encoder/heads/postprocess.py:11-64 — the "exp"
parameterization used by the flagship config: the raw 3-channel output is
split into a unit direction and a distance passed through expm1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# Distance cap for the "exp" parameterization.  expm1 is unbounded, and
# from-scratch training can run the raw norm away exponentially (observed:
# norm 18 at init -> 72 after 20 steps -> every point at 2.5e31, outside
# any frustum, with zero photometric gradient = unrecoverable collapse).
# Below D_CAP (points up to expm1(9.21) ~ 1e4, i.e. 100x past any far
# plane) the mapping is EXACTLY the reference's — converted-checkpoint
# parity is untouched.  Past it the norm grows log-slowly and stays
# differentiable, so the reprojection loss keeps a pull-back signal.
D_CAP = 9.21


def pts3d_postprocess(raw_xyz: jax.Array, mode: str = "exp") -> jax.Array:
    """(..., 3) raw head output -> (..., 3) 3D points."""
    if mode == "linear":
        return raw_xyz
    # sqrt(sum + eps), not linalg.norm: the norm VJP is x/norm, which is
    # NaN at the origin (deviation from the reference mapping: <=1e-16).
    d = jnp.sqrt(jnp.sum(raw_xyz**2, axis=-1, keepdims=True) + 1e-16)
    direction = raw_xyz / jnp.maximum(d, 1e-8)
    if mode == "exp":
        d = jnp.where(
            d <= D_CAP, d, D_CAP + 0.1 * jnp.log1p(jnp.maximum(d - D_CAP, 0.0))
        )
        return direction * jnp.expm1(d)
    if mode == "square":
        return direction * d**2
    raise ValueError(f"bad pts3d mode {mode!r}")
