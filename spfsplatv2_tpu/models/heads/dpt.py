"""DPT prediction heads (pointmap + Gaussian-parameter variants) in flax.

TPU-native NHWC re-implementation of the reference DPT adapter stack
(reference: src/model/encoder/heads/dpt_block.py:264-459, dpt_head.py:22-117,
dpt_gs_head.py:20-130): four ViT token maps are hooked from layers
[0, 2/4*D, 3/4*D, D], projected and resampled into a feature pyramid,
fused through four RefineNet-style fusion blocks, and decoded by a conv
head at full image resolution. The GS variant (`DPTGSHead`) adds a 2x
feature upsample plus a Conv7x7 RGB skip (`input_merger`) so Gaussian
parameters see full-resolution image detail.

All heads compute in float32 (the reference wraps heads in
`autocast(enabled=False)`, encoder_spfsplatv2.py:200).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from spfsplatv2_tpu.utils.interp import resize_bilinear


class ResidualConvUnit(nn.Module):
    """ReLU-Conv3-ReLU-Conv3 with skip (reference dpt_block.py:80-139)."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(h)
        return x + h


class FeatureFusionBlock(nn.Module):
    """RefineNet-style fusion (reference dpt_block.py:141-218)."""

    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="resConfUnit1")(skip)
        x = ResidualConvUnit(self.features, name="resConfUnit2")(x)
        h, w = x.shape[-3], x.shape[-2]
        x = resize_bilinear(x, (2 * h, 2 * w), align_corners=True)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DPTCore(nn.Module):
    """Token pyramid -> fused full-ish-resolution feature map."""

    layer_dims: Sequence[int] = (96, 192, 384, 768)
    feature_dim: int = 256

    @nn.compact
    def __call__(self, hooked_tokens, grid):
        """hooked_tokens: list of 4 (b, p, c_i); grid: (gh, gw)."""
        gh, gw = grid
        maps = [
            t.reshape(t.shape[0], gh, gw, t.shape[-1]) for t in hooked_tokens
        ]

        # act_postprocess: project + resample to the pyramid resolutions
        # (reference dpt_block.py:356-421).
        l0 = nn.Conv(self.layer_dims[0], (1, 1), name="act_0_proj")(maps[0])
        l0 = nn.ConvTranspose(
            self.layer_dims[0], (4, 4), strides=(4, 4), transpose_kernel=True,
            name="act_0_up",
        )(l0)
        l1 = nn.Conv(self.layer_dims[1], (1, 1), name="act_1_proj")(maps[1])
        l1 = nn.ConvTranspose(
            self.layer_dims[1], (2, 2), strides=(2, 2), transpose_kernel=True,
            name="act_1_up",
        )(l1)
        l2 = nn.Conv(self.layer_dims[2], (1, 1), name="act_2_proj")(maps[2])
        l3 = nn.Conv(self.layer_dims[3], (1, 1), name="act_3_proj")(maps[3])
        l3 = nn.Conv(
            self.layer_dims[3], (3, 3), strides=(2, 2), padding=1, name="act_3_down"
        )(l3)

        # scratch.layer_rn projections to the shared feature dim.
        rn = [
            nn.Conv(
                self.feature_dim, (3, 3), padding=1, use_bias=False,
                name=f"layer{i+1}_rn",
            )(l)
            for i, l in enumerate([l0, l1, l2, l3])
        ]

        path4 = FeatureFusionBlock(self.feature_dim, name="refinenet4")(rn[3])
        path4 = path4[:, : rn[2].shape[1], : rn[2].shape[2]]
        path3 = FeatureFusionBlock(self.feature_dim, name="refinenet3")(path4, rn[2])
        path2 = FeatureFusionBlock(self.feature_dim, name="refinenet2")(path3, rn[1])
        path1 = FeatureFusionBlock(self.feature_dim, name="refinenet1")(path2, rn[0])
        return path1  # (b, 8*gh, 8*gw, feature_dim)


class DPTHead(nn.Module):
    """Regression DPT head (pointmaps): conv head + 2x upsample to full res.

    Reference: create_dpt_head (dpt_head.py:99-117), head_type='regression'.
    """

    out_channels: int = 3
    feature_dim: int = 256
    last_dim: int = 128
    layer_dims: Sequence[int] = (96, 192, 384, 768)
    # Calibrated final-layer init for FROM-SCRATCH training (loading a
    # converted MASt3R checkpoint overwrites it, so parity is untouched):
    # flax's default init on post-relu features emits raw pointmap norms
    # ~O(10) -> expm1 puts every point at ~1e8, outside any frustum, with
    # zero photometric gradient.  A small kernel + bias (0, 0, 1.2) starts
    # points near (0, 0, expm1(1.2) ~ 2.3) — in front of the camera,
    # renderable, trainable.
    out_bias: Sequence[float] | None = None

    @nn.compact
    def __call__(self, hooked_tokens, grid):
        x = DPTCore(
            layer_dims=self.layer_dims, feature_dim=self.feature_dim,
            name="core",
        )(hooked_tokens, grid)
        x = nn.Conv(self.feature_dim // 2, (3, 3), padding=1, name="head_conv1")(x)
        x = resize_bilinear(
            x, (2 * x.shape[-3], 2 * x.shape[-2]), align_corners=True
        )
        x = nn.Conv(self.last_dim, (3, 3), padding=1, name="head_conv2")(x)
        x = nn.relu(x)
        kwargs = {}
        if self.out_bias is not None:
            bias = jnp.asarray(self.out_bias, jnp.float32)
            kwargs = dict(
                # 0.1x lecun: raw norms ~O(1) around the bias (vs ~18 at
                # default scale -> points at 1e8) while upstream gradient
                # flow only shrinks 10x (an absolute-scale init like
                # normal(1e-3) throttles the DPT core's learning ~250x;
                # measured: tiny-overfit loss froze).
                kernel_init=nn.initializers.variance_scaling(
                    0.01, "fan_in", "truncated_normal"
                ),
                bias_init=lambda key, shape, dtype=jnp.float32: (
                    jnp.broadcast_to(bias, shape).astype(dtype)
                ),
            )
        return nn.Conv(
            self.out_channels, (1, 1), name="head_out", **kwargs
        )(x)


class DPTGSHead(nn.Module):
    """Gaussian-parameter DPT head with full-res RGB skip.

    Reference: dpt_gs_head.py:26-130 — feat_up 2x upsample, input_merger
    Conv7x7(3->256) on the normalized input image, then the gs_params head.
    """

    out_channels: int
    feature_dim: int = 256
    layer_dims: Sequence[int] = (96, 192, 384, 768)
    # From-scratch: 0.1x-lecun final init puts raw gaussian params near 0
    # -> gray colors (the SH +0.5 convention), sigmoid opacity 0.5, and
    # ~1.6 px footprints (the EWA low-pass floor) — a renderable, calm
    # start (default init saturates colors; measured mse 0.40 and grads
    # ~25 at 608M).  Converted checkpoints overwrite it.
    out_kernel_scale: float | None = 0.01

    @nn.compact
    def __call__(self, hooked_tokens, grid, image):
        """image: (b, h, w, 3) normalized input at full resolution."""
        x = DPTCore(
            layer_dims=self.layer_dims, feature_dim=self.feature_dim,
            name="core",
        )(hooked_tokens, grid)
        x = resize_bilinear(
            x, (2 * x.shape[-3], 2 * x.shape[-2]), align_corners=True
        )
        skip = nn.Conv(
            self.feature_dim, (7, 7), padding=3, name="input_merger"
        )(image)
        skip = nn.relu(skip)
        x = x + skip
        x = nn.Conv(
            self.feature_dim, (3, 3), padding=1, use_bias=False, name="head_conv"
        )(x)
        x = nn.relu(x)
        kwargs = {}
        if self.out_kernel_scale is not None:
            kwargs = dict(
                kernel_init=nn.initializers.variance_scaling(
                    self.out_kernel_scale, "fan_in", "truncated_normal"
                )
            )
        return nn.Conv(
            self.out_channels, (1, 1), name="head_out", **kwargs
        )(x)
