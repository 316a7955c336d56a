"""MLP pose head: decoder tokens -> 9D pose encoding (6D rot + 3D t).

TPU-native re-implementation of the reference PoseHead
(reference: src/model/encoder/heads/pose_head.py:22-114). For SPFSplatV2 the
input is the learnable pose token (a single token, so no pooling); the
rotation branch is initialized to emit the identity 6D encoding
[1, 0, 0, 0, 1, 0] and (with `init_t`) zero translation.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class PoseHeadConfig:
    init_t: bool = True            # pose_init_t
    use_homogeneous: bool = False
    concat_enc: bool = False
    # Homogeneous bounds (reference lines 50-57).
    min_scale: float = 0.01
    max_scale: float = 4.0


class PoseHead(nn.Module):
    cfg: PoseHeadConfig = PoseHeadConfig()

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        """tokens (b, n, c) — pooled over n (a single pose token => no-op).

        Returns (b, 9) = [6D rotation | translation].
        """
        feat = jnp.mean(tokens, axis=1)
        d = feat.shape[-1]
        feat = nn.Dense(d // 2, name="mlp1")(feat)
        feat = nn.relu(feat)
        feat = nn.Dense(d // 4, name="mlp2")(feat)
        feat = nn.relu(feat)

        t_dim = 4 if self.cfg.use_homogeneous else 3
        t_init = (
            dict(kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros)
            if self.cfg.init_t
            else {}
        )
        out_t = nn.Dense(t_dim, name="fc_t", **t_init)(feat)
        if self.cfg.use_homogeneous:
            import math

            max_inv = 1.0 / self.cfg.max_scale
            min_inv = 1.0 / self.cfg.min_scale
            beta = math.log(2.0) / (1.0 - max_inv)
            h = jax.nn.softplus(beta * out_t[:, 3:4]) / beta + max_inv
            h = jnp.minimum(h, min_inv)
            out_t = out_t[:, :3] / h

        rot_bias = jnp.asarray([1.0, 0, 0, 0, 1.0, 0], jnp.float32)
        out_r = nn.Dense(
            6,
            name="fc_rot",
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: rot_bias.astype(dtype),
        )(feat)
        return jnp.concatenate([out_r, out_t], axis=-1)
