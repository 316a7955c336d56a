"""VGGT camera head: iterative AdaLN refinement of a 9D pose encoding.

TPU-native re-implementation of the vendored CameraHead
(reference: src/model/encoder/backbone/vggt/heads/camera_head.py:20-170):
camera tokens (index 0 of the last aggregator layer, 2C = 2048-d) are
refined over `num_iterations` steps — each step embeds the (detached)
previous 9D prediction, produces AdaLN shift/scale/gate modulation, runs a
4-block transformer trunk, and adds an MLP delta. The encoding is
[absT (3) | quat xyzw (4) | FoV h,w (2)] of the world-to-camera transform,
with ReLU on the FoV terms.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from spfsplatv2_tpu.models.vggt.layers import VGGTBlock


@dataclass(frozen=True)
class CameraHeadConfig:
    dim_in: int = 2048
    trunk_depth: int = 4
    num_heads: int = 16
    mlp_ratio: float = 4.0
    init_values: float = 0.01
    num_iterations: int = 4
    target_dim: int = 9


class CameraHead(nn.Module):
    cfg: CameraHeadConfig = CameraHeadConfig()

    @nn.compact
    def __call__(
        self, camera_tokens: jax.Array, view_valid: jax.Array | None = None
    ) -> jax.Array:
        """camera_tokens (b, v, c) -> final activated pose encoding (b, v, 9).

        The trunk attends ACROSS views' camera tokens, so static-shape view
        dropout must mask dropped views here too: `view_valid` ((v,)
        bool/float, optional) blocks an invalid view's token as an
        attention KEY for every query, making the refinement equivalent to
        slicing the view out (the reference drops by slicing the batch
        before the encoder, model_wrapper.py:91-116)."""
        cfg = self.cfg
        b, v, c = camera_tokens.shape
        attn_mask = None
        if view_valid is not None:
            attn_mask = jnp.where(
                view_valid.astype(bool)[None, :], 0.0, -jnp.inf
            ) * jnp.ones((v, 1))
        tokens = nn.LayerNorm(dtype=jnp.float32, name="token_norm")(camera_tokens)

        empty_pose = self.param(
            "empty_pose_tokens", nn.initializers.zeros, (1, 1, cfg.target_dim)
        )
        embed_pose = nn.Dense(cfg.dim_in, name="embed_pose")
        modulation = nn.Dense(3 * cfg.dim_in, name="poseLN_modulation")
        adaln_norm = nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=jnp.float32,
            name="adaln_norm",
        )
        trunk = [
            VGGTBlock(
                cfg.num_heads, cfg.mlp_ratio, qk_norm=False,
                init_values=cfg.init_values, rope_base=None,
                compute_dtype=jnp.float32, name=f"trunk_{i}",
            )
            for i in range(cfg.trunk_depth)
        ]
        trunk_norm = nn.LayerNorm(dtype=jnp.float32, name="trunk_norm")
        branch_fc1 = nn.Dense(cfg.dim_in // 2, name="pose_branch_fc1")
        branch_fc2 = nn.Dense(cfg.target_dim, name="pose_branch_fc2")

        pred = None
        for _ in range(cfg.num_iterations):
            if pred is None:
                module_input = embed_pose(
                    jnp.broadcast_to(empty_pose, (b, v, cfg.target_dim))
                )
            else:
                module_input = embed_pose(jax.lax.stop_gradient(pred))
            mod = modulation(nn.silu(module_input))
            shift, scale, gate = jnp.split(mod, 3, axis=-1)
            x = gate * (adaln_norm(tokens) * (1 + scale) + shift)
            x = x + tokens
            for blk in trunk:
                x = blk(x, mask=attn_mask)
            delta = branch_fc2(nn.gelu(branch_fc1(trunk_norm(x)), approximate=False))
            pred = delta if pred is None else pred + delta

        # activate_pose: linear T/quat, relu FoV (head_act.py:12-35).
        return jnp.concatenate(
            [pred[..., :7], jax.nn.relu(pred[..., 7:])], axis=-1
        )


def pose_encoding_to_w2c(enc: jax.Array) -> jax.Array:
    """[absT | quat xyzw | fov] -> (.., 4, 4) world-to-camera matrix.

    Reference: pose_encoding_to_extri_intri (vggt/utils/pose_enc.py:67-134);
    quaternions are scalar-LAST (xyzw, vggt/utils/rotation.py:14-44).
    """
    from spfsplatv2_tpu.geometry.se3 import pack_rt, quaternion_to_matrix

    t = enc[..., :3]
    quat_xyzw = enc[..., 3:7]
    quat_wxyz = jnp.concatenate(
        [quat_xyzw[..., 3:4], quat_xyzw[..., :3]], axis=-1
    )
    return pack_rt(quaternion_to_matrix(quat_wxyz), t)


def fov_to_intrinsics(enc: jax.Array) -> jax.Array:
    """FoV terms -> normalized intrinsics with centered principal point."""
    fov_h = enc[..., 7]
    fov_w = enc[..., 8]
    fy = 0.5 / jnp.tan(fov_h / 2.0)
    fx = 0.5 / jnp.tan(fov_w / 2.0)
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    rows = jnp.stack(
        [fx, zeros, 0.5 * ones, zeros, fy, 0.5 * ones, zeros, zeros, ones],
        axis=-1,
    )
    return rows.reshape(*enc.shape[:-1], 3, 3)
