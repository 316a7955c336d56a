"""Splatting decoder: Gaussians + cameras -> rendered images/depths.

TPU-native equivalent of the reference DecoderSplattingCUDA
(reference: src/model/decoder/decoder_splatting_cuda.py:23-78): flattens the
(batch, view) camera axes, renders every view of every scene against that
scene's Gaussian set with the differentiable rasterizer, and (in
scale-invariant mode) rescales returned depths back by `near`. The
reference's per-camera Python loop is a vmap here.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from flax import struct

from spfsplatv2_tpu.gaussians import Gaussians
from spfsplatv2_tpu.ops.rasterizer import RasterizerConfig, RenderOutput, render


@dataclass(frozen=True)
class DecoderConfig:
    background_color: tuple[float, float, float] = (0.0, 0.0, 0.0)
    make_scale_invariant: bool = True
    rasterizer: RasterizerConfig = field(default_factory=RasterizerConfig)


@struct.dataclass
class DecoderOutput:
    color: jax.Array  # (b, v, h, w, 3)
    depth: jax.Array  # (b, v, h, w)
    alpha: jax.Array  # (b, v, h, w)


def decode_splatting(
    gaussians: Gaussians,          # (b, g, ...)
    extrinsics: jax.Array,         # (b, v, 4, 4) c2w
    intrinsics: jax.Array,         # (b, v, 3, 3) normalized
    near: jax.Array,               # (b, v)
    far: jax.Array,                # (b, v)
    image_shape: tuple[int, int],
    cfg: DecoderConfig = DecoderConfig(),
) -> DecoderOutput:
    b, v = extrinsics.shape[:2]
    bg = jnp.asarray(cfg.background_color, extrinsics.dtype)
    bg = jnp.broadcast_to(bg, (v, 3))

    raster_cfg = RasterizerConfig(
        **{
            **cfg.rasterizer.__dict__,
            "scale_invariant": cfg.make_scale_invariant,
        }
    )

    def render_scene(g: Gaussians, e, k, n, f):
        return render(
            e, k, n, f, image_shape, bg,
            g.means, g.covariances, g.harmonics, g.opacities,
            cfg=raster_cfg,
        )

    out: RenderOutput = jax.vmap(render_scene)(
        gaussians, extrinsics, intrinsics, near, far
    )
    depth = out.depth
    if cfg.make_scale_invariant:
        # Undo the 1/near world rescale (reference decoder_splatting_cuda.py:74-76).
        depth = depth * near[..., None, None]
    return DecoderOutput(color=out.color, depth=depth, alpha=out.alpha)
