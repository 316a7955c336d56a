"""Photometric MSE loss (reference: src/loss/loss_mse.py:36-50)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse_loss(
    prediction: jax.Array,
    target: jax.Array,
    weight: float = 1.0,
    global_step=None,
    apply_after_step: int = 0,
) -> jax.Array:
    """Mean squared color error, gated by `apply_after_step`."""
    delta = prediction - target
    loss = weight * jnp.mean(delta**2)
    if apply_after_step > 0 and global_step is not None:
        loss = jnp.where(global_step >= apply_after_step, loss, 0.0)
    return loss
