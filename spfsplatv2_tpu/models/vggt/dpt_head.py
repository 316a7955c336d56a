"""VGGT DPT heads (point map + Gaussian params) over aggregator tokens.

TPU-native re-implementation of the vendored heads
(reference: src/model/encoder/backbone/vggt/heads/dpt_head.py:43-260 and
dpt_gs_head.py:22-330). Differences from the CroCo-side DPT (models/heads/
dpt.py): a LayerNorm on the hooked 2048-d tokens, per-hook out_channels
[256, 512, 1024, 1024], refinenet4 without the residual input, sinusoidal
uv-grid positional embeddings added to the pyramid maps (ratio 0.1), and a
full-resolution upsample to patch_size * grid before the output convs. The
GS variant adds a Conv7x7(3 -> 128) RGB skip (`input_merger`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from spfsplatv2_tpu.utils.interp import resize_bilinear


class VGGTResidualConvUnit(nn.Module):
    """vggt's ResidualConvUnit (dpt_head.py:358-400) — NOTE the skip adds
    relu(x), not x: the reference passes nn.ReLU(inplace=True) as the
    activation, so `out = act(x)` mutates the residual before
    `out + x`. The released VGGT-1B weights bake in this behavior, so it is
    reproduced here deliberately."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(h)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(y)
        return y + h


class VGGTFeatureFusionBlock(nn.Module):
    """vggt FeatureFusionBlock (dpt_head.py:403-470): optional residual
    unit on the skip input, refinement, interpolate to `out_hw` (or 2x),
    1x1 out conv."""

    features: int

    @nn.compact
    def __call__(self, x, skip=None, out_hw=None):
        if skip is not None:
            x = x + VGGTResidualConvUnit(self.features, name="resConfUnit1")(skip)
        x = VGGTResidualConvUnit(self.features, name="resConfUnit2")(x)
        if out_hw is None:
            out_hw = (2 * x.shape[-3], 2 * x.shape[-2])
        x = resize_bilinear(x, out_hw, align_corners=True)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)

HOOK_FRACTIONS = (4 / 23, 11 / 23, 17 / 23, 1.0)


def vggt_hooks(n_layers: int) -> tuple[int, ...]:
    """intermediate_layer_idx = [4, 11, 17, 23] at depth 24, scaled for
    other depths (tiny test models)."""
    return tuple(round(f * (n_layers - 1)) for f in HOOK_FRACTIONS)


def uv_pos_embed(gh: int, gw: int, channels: int, aspect: float) -> jax.Array:
    """Sinusoidal embedding of a normalized uv grid, ratio applied by caller.

    Reference: create_uv_grid + position_grid_to_embed
    (vggt/heads/utils.py:11-105), omega_0 = 100.
    """
    diag = (aspect**2 + 1.0) ** 0.5
    span_x, span_y = aspect / diag, 1.0 / diag
    xs = jnp.linspace(
        -span_x * (gw - 1) / gw, span_x * (gw - 1) / gw, gw
    )
    ys = jnp.linspace(
        -span_y * (gh - 1) / gh, span_y * (gh - 1) / gh, gh
    )
    uu, vv = jnp.meshgrid(xs, ys, indexing="xy")

    def sincos(pos, dim):
        omega = jnp.arange(dim // 2, dtype=jnp.float32) / (dim / 2.0)
        omega = 1.0 / (100.0**omega)
        out = pos.reshape(-1)[:, None] * omega[None]
        return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=-1)

    emb = jnp.concatenate(
        [sincos(uu, channels // 2), sincos(vv, channels // 2)], axis=-1
    ).astype(jnp.float32)
    return emb.reshape(gh, gw, channels)


class VGGTDPTHead(nn.Module):
    """Point-map / feature DPT head on (b, v, p, 2C) aggregator tokens."""

    output_dim: int = 4
    features: int = 256
    out_channels: Sequence[int] = (256, 512, 1024, 1024)
    patch_size: int = 14
    pos_embed: bool = True
    gs_variant: bool = False   # adds RGB input_merger skip, raw output
    hooks: Optional[Sequence[int]] = None  # default: vggt_hooks(n_layers)

    @nn.compact
    def __call__(self, tokens_list, grid, patch_start, images=None):
        """tokens_list: per-layer (b, v, p_total, 2C); images (b, v, h, w, 3)
        required for the GS variant. Returns (b, v, H, W, output_dim)
        [+ (b, v, H, W) confidence for the point head]."""
        gh, gw = grid
        b, v = tokens_list[0].shape[:2]
        h_out, w_out = gh * self.patch_size, gw * self.patch_size
        aspect = w_out / h_out

        norm = nn.LayerNorm(dtype=jnp.float32, name="norm")
        pyramid = []
        hooks = self.hooks or vggt_hooks(len(tokens_list))
        for i, hook in enumerate(hooks):
            x = tokens_list[hook][:, :, patch_start:]
            x = norm(x)
            x = x.reshape(b * v, gh, gw, x.shape[-1])
            x = nn.Conv(self.out_channels[i], (1, 1), name=f"projects_{i}")(x)
            if self.pos_embed:
                x = x + uv_pos_embed(gh, gw, self.out_channels[i], aspect) * 0.1
            if i == 0:
                x = nn.ConvTranspose(
                    self.out_channels[0], (4, 4), strides=(4, 4),
                    transpose_kernel=True, name="resize_0",
                )(x)
            elif i == 1:
                x = nn.ConvTranspose(
                    self.out_channels[1], (2, 2), strides=(2, 2),
                    transpose_kernel=True, name="resize_1",
                )(x)
            elif i == 3:
                x = nn.Conv(
                    self.out_channels[3], (3, 3), strides=(2, 2), padding=1,
                    name="resize_3",
                )(x)
            pyramid.append(x)

        rn = [
            nn.Conv(
                self.features, (3, 3), padding=1, use_bias=False,
                name=f"layer{i+1}_rn",
            )(p)
            for i, p in enumerate(pyramid)
        ]
        # Fusion interpolates to the NEXT pyramid level's exact size
        # (reference scratch_forward, dpt_head.py:285-300).
        path4 = VGGTFeatureFusionBlock(self.features, name="refinenet4")(
            rn[3], out_hw=rn[2].shape[1:3]
        )
        path3 = VGGTFeatureFusionBlock(self.features, name="refinenet3")(
            path4, rn[2], out_hw=rn[1].shape[1:3]
        )
        path2 = VGGTFeatureFusionBlock(self.features, name="refinenet2")(
            path3, rn[1], out_hw=rn[0].shape[1:3]
        )
        path1 = VGGTFeatureFusionBlock(self.features, name="refinenet1")(
            path2, rn[0]
        )

        out = nn.Conv(
            self.features // 2, (3, 3), padding=1, name="output_conv1"
        )(path1)
        out = resize_bilinear(out, (h_out, w_out), align_corners=True)

        if self.gs_variant:
            assert images is not None
            skip = nn.Conv(128, (7, 7), padding=3, name="input_merger")(
                images.reshape(b * v, h_out, w_out, 3)
            )
            out = out + nn.relu(skip)

        if self.pos_embed:
            out = out + uv_pos_embed(h_out, w_out, out.shape[-1], aspect) * 0.1

        out = nn.Conv(32, (3, 3), padding=1, name="output_conv2_0")(out)
        out = nn.relu(out)
        # From-scratch: 0.1x-lecun final init for the GS variant (gray
        # colors / 0.5 opacity start; see heads/dpt.py DPTGSHead) — the
        # VGGT-converted checkpoint overwrites it.
        kwargs = {}
        if self.gs_variant:
            kwargs = dict(
                kernel_init=nn.initializers.variance_scaling(
                    0.01, "fan_in", "truncated_normal"
                )
            )
        out = nn.Conv(
            self.output_dim, (1, 1), name="output_conv2_2", **kwargs
        )(out)
        out = out.reshape(b, v, h_out, w_out, self.output_dim)

        if self.gs_variant:
            return out

        # Point head: inv_log xyz + expp1 confidence (head_act.py:61-100).
        xyz, conf = out[..., :-1], out[..., -1]
        pts3d = jnp.sign(xyz) * jnp.expm1(jnp.abs(xyz))
        conf = 1.0 + jnp.exp(conf)
        return pts3d, conf
