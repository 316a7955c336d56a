"""Public differentiable rasterizer API (batched over cameras).

Mirrors the call surface of the reference's `render_cuda`
(reference: src/model/decoder/cuda_splatting.py:45-144), with the CUDA
per-batch Python loop replaced by `jax.vmap` over cameras, and the
`diff_gauss_pose` fork's pose gradient (`viewmatrix` as a differentiable
call-time argument) supported natively because the projection stage is
plain autodiff-able XLA.

Backends:
  * "pallas"    — hand-written TPU kernels over the PREFIX entry layout
                  (the binning sort's live prefix IS the slot space);
                  unrolled per-camera pipeline.  The production path.
  * "tiled"     — tile-binned pure-XLA path (fully differentiable; the
                  CPU/GPU fallback and an independent implementation for
                  A/B comparison)
  * "reference" — dense O(pixels x gaussians) oracle (tests / tiny scenes)

Retired round-1/2 layouts (pallas_padded fixed-stride, pallas_compact
chunk-aligned ragged, pallas_batched flat multi-camera) were measured
slower and lived here as selectable backends; they are deleted (see git
history / PERFORMANCE.md for the measurements that killed them).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from spfsplatv2_tpu.ops.raster_common import project_gaussians
from spfsplatv2_tpu.ops.raster_ref import composite_reference
from spfsplatv2_tpu.ops.raster_tiled import bin_gaussians, composite_tiles


@dataclass(frozen=True)
class RasterizerConfig:
    backend: str = "auto"  # auto -> pallas on TPU, tiled elsewhere
    max_tiles_per_gaussian: int = 16
    max_per_tile: int = 2048
    chunk: int = 128
    scale_invariant: bool = True
    use_sh: bool = True
    # Compact-layout live-entry budget; None = g * max_tiles_per_gaussian
    # (exact, never drops).  Production configs set ~2.5x the expected live
    # entry count: tiles that overflow the budget are dropped whole, so
    # leave headroom.  The aligned slot space + attribute gather scale
    # with this.  entry_budget_factor expresses it relative to g (used by
    # the model/decoder path where g depends on batch/view shapes);
    # absolute entry_budget wins when both are set.
    entry_budget: int | None = None
    entry_budget_factor: float | None = None
    # Two-tier duplicate expansion (prefix backend): every gaussian gets
    # `base_tiles_per_gaussian` slots; gaussians touching more tiles draw
    # their remaining (max_tiles_per_gaussian - base) slots from a pool of
    # g * big_pool_factor rows.  Cuts the binning sort ~3x at pixel-aligned
    # workloads (~1.5 touched tiles/gaussian).  None = single-tier.
    base_tiles_per_gaussian: int | None = 4
    big_pool_factor: float = 0.125
    # "rank" = exact within-tile depth order (double argsort); "quantized"
    # = top f32 depth bits straight into the sort key (no argsort; ties at
    # ~1e-4 relative depth compose in arbitrary order — visually and
    # numerically negligible for real scenes).
    depth_key: str = "rank"


@struct.dataclass
class RenderOutput:
    color: jax.Array  # (..., h, w, 3)
    depth: jax.Array  # (..., h, w)
    alpha: jax.Array  # (..., h, w)
    # (cam,) int32 live tile entries dropped by the entry budget / per-tile
    # caps (0 = none).  Overflow drops are silent in the image (black /
    # truncated tiles), so they MUST be observable as a metric.
    dropped_entries: jax.Array | None = None


def _render_one(
    means, covariances, harmonics, opacities,
    c2w, intrinsics, background,
    image_shape, sh_degree, cfg: RasterizerConfig,
    ewa_reference_shape=None,
):
    proj = project_gaussians(
        means, covariances, harmonics, opacities, c2w, intrinsics,
        image_shape, sh_degree=sh_degree, use_sh=cfg.use_sh,
        ewa_reference_shape=ewa_reference_shape,
    )
    backend = cfg.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "tiled"
    dropped = jnp.zeros((), jnp.int32)
    if backend == "reference":
        color, depth, alpha = composite_reference(proj, image_shape, background)
    elif backend == "tiled":
        bins = bin_gaussians(proj, image_shape, cfg.max_tiles_per_gaussian)
        diff = bins.tile_starts[1:] - bins.tile_starts[:-1]
        dropped = jnp.sum(jnp.maximum(diff - cfg.max_per_tile, 0))
        color, depth, alpha = composite_tiles(
            proj, bins, image_shape, background,
            max_per_tile=cfg.max_per_tile, chunk=cfg.chunk,
        )
    elif backend == "pallas":
        from spfsplatv2_tpu.ops.raster_pallas import composite_pallas_prefix
        from spfsplatv2_tpu.ops.raster_tiled import bin_gaussians_prefix

        g = means.shape[0]
        budget = cfg.entry_budget
        if budget is None and cfg.entry_budget_factor is not None:
            budget = int(cfg.entry_budget_factor * g)
        if budget is None:
            budget = g * cfg.max_tiles_per_gaussian
        budget = -(-min(budget, g * cfg.max_tiles_per_gaussian) // 128) * 128
        bins = bin_gaussians_prefix(
            proj, image_shape, cfg.max_tiles_per_gaussian, cfg.chunk, budget,
            base_tiles_per_gaussian=cfg.base_tiles_per_gaussian,
            big_pool_factor=cfg.big_pool_factor,
            depth_key=cfg.depth_key,
        )
        dropped = bins.n_overflow
        color, depth, alpha = composite_pallas_prefix(
            proj, bins, image_shape, background, chunk=cfg.chunk,
        )
    else:
        raise ValueError(f"unknown rasterizer backend {backend!r}")
    return color, depth, alpha, dropped


@partial(
    jax.jit,
    static_argnames=("image_shape", "sh_degree", "cfg", "ewa_reference_shape"),
)
def render(
    extrinsics: jax.Array,       # (cam, 4, 4) camera-to-world
    intrinsics: jax.Array,       # (cam, 3, 3) normalized
    near: jax.Array,             # (cam,)
    far: jax.Array,              # (cam,)
    image_shape: tuple[int, int],
    background: jax.Array,       # (cam, 3)
    means: jax.Array,            # (cam, g, 3) or (g, 3) shared
    covariances: jax.Array,      # (cam, g, 3, 3) or (g, 3, 3)
    harmonics: jax.Array,        # (cam, g, 3, d_sh) or (g, 3, d_sh)
    opacities: jax.Array,        # (cam, g) or (g,)
    sh_degree: int | None = None,
    cfg: RasterizerConfig = RasterizerConfig(),
    ewa_reference_shape: tuple[int, int] | None = None,
) -> RenderOutput:
    """Render a batch of cameras over (shared or per-camera) Gaussian sets.

    `scale_invariant` mode rescales the world by 1/near per camera before
    rendering (reference: cuda_splatting.py:66-75); depth is returned in the
    RESCALED world like the reference (the decoder multiplies by near again).
    """
    shared = means.ndim == 2

    if cfg.scale_invariant:
        scale = 1.0 / near  # (cam,)
        extrinsics = extrinsics.at[..., :3, 3].mul(scale[:, None])
        if shared:
            # Per-camera scaling makes the gaussian set per-camera.
            means = means[None] * scale[:, None, None]
            covariances = covariances[None] * (scale[:, None, None, None] ** 2)
            harmonics = jnp.broadcast_to(
                harmonics[None], (near.shape[0], *harmonics.shape)
            )
            opacities = jnp.broadcast_to(
                opacities[None], (near.shape[0], *opacities.shape)
            )
            shared = False
        else:
            means = means * scale[:, None, None]
            covariances = covariances * (scale[:, None, None, None] ** 2)

    n_cam = extrinsics.shape[0]
    outs = []
    for i in range(n_cam):
        sel = (lambda x: x) if shared else (lambda x: x[i])
        outs.append(
            _render_one(
                sel(means), sel(covariances), sel(harmonics), sel(opacities),
                extrinsics[i], intrinsics[i], background[i],
                image_shape, sh_degree, cfg, ewa_reference_shape,
            )
        )
    color = jnp.stack([o[0] for o in outs])
    depth = jnp.stack([o[1] for o in outs])
    alpha = jnp.stack([o[2] for o in outs])
    dropped = jnp.stack([o[3] for o in outs])

    return RenderOutput(color=color, depth=depth, alpha=alpha,
                        dropped_entries=dropped)
