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
    # Pixel-aligned gaussian clouds project ~1.6 live tile entries per
    # gaussian; 4x leaves 2.5x headroom before whole-tile drops while
    # keeping the compact rasterizer layout (sort/gather/scatter sizes)
    # proportional to live entries instead of g * max_tiles_per_gaussian.
    rasterizer: RasterizerConfig = field(
        default_factory=lambda: RasterizerConfig(entry_budget_factor=4.0)
    )


@struct.dataclass
class DecoderOutput:
    color: jax.Array  # (b, v, h, w, 3)
    depth: jax.Array  # (b, v, h, w)
    alpha: jax.Array  # (b, v, h, w)
    # (b, v) int32 tile entries silently dropped by the rasterizer's entry
    # budget (surfaced as the raster/dropped_entries train metric).
    dropped_entries: jax.Array | None = None


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
    return DecoderOutput(color=out.color, depth=depth, alpha=out.alpha,
                         dropped_entries=out.dropped_entries)


def decode_orthographic(
    gaussians: Gaussians,          # (b, g, ...)
    extrinsics: jax.Array,         # (b, v, 4, 4) c2w
    width: jax.Array,              # (b, v) world-space view width
    height: jax.Array,             # (b, v) world-space view height
    near: jax.Array,               # (b, v)
    far: jax.Array,                # (b, v)
    image_shape: tuple[int, int],
    cfg: DecoderConfig = DecoderConfig(),
    fov_degrees: float = 0.1,
) -> DecoderOutput:
    """Approximately-orthographic rendering for figures/visualization.

    Reference: render_cuda_orthographic
    (src/model/decoder/cuda_splatting.py:146-255): fake an orthographic
    projection by RETREATING the camera along -z until a tiny
    `fov_degrees` frustum spans the requested world-space width — rays
    become near-parallel.  Here that reduces to a pose/near/far shift plus
    synthesized normalized intrinsics through the standard perspective
    rasterizer (no separate kernel needed).
    """
    tan_fov_x = jnp.tan(jnp.deg2rad(fov_degrees) * 0.5)
    distance = (0.5 * width) / tan_fov_x              # (b, v)
    tan_fov_y = 0.5 * height / distance

    move_back = jnp.eye(4).at[2, 3].set(1.0)          # scaled per camera below
    shift = (
        jnp.broadcast_to(jnp.eye(4), extrinsics.shape)
        .at[..., 2, 3].set(-distance)
    )
    extrinsics = extrinsics @ shift
    del move_back

    # Normalized pinhole K for the tiny frustum: fx = 0.5 / tan(fov/2).
    fx = 0.5 / tan_fov_x
    fy = 0.5 / tan_fov_y
    k = jnp.zeros((*extrinsics.shape[:2], 3, 3), extrinsics.dtype)
    k = (
        k.at[..., 0, 0].set(fx)
        .at[..., 1, 1].set(fy)
        .at[..., 0, 2].set(0.5)
        .at[..., 1, 2].set(0.5)
        .at[..., 2, 2].set(1.0)
    )
    return decode_splatting(
        gaussians, extrinsics, k, near + distance, far + distance,
        image_shape, cfg,
    )
