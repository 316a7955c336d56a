"""Within-replica rasterizer sharding over the `tile` mesh axis.

The TPU-native analog of "sequence parallelism" for this workload
(SURVEY.md section 5.7): the scaling axes that matter are the view axis of
attention and the PIXEL/TILE axis of the rasterizer. Here each device of the
`tile` axis renders a horizontal band of the image — implemented purely as
camera math (a principal-point/focal adjustment maps a band to a standalone
render), so the band render reuses the full single-device rasterizer
(including the Pallas kernels). Gaussians are replicated across the tile
axis; bands concatenate via the shard_map output spec. Combined with the
`data` axis this is the deployment layout for the 512^2 stretch: scenes
data-parallel, tiles sharded within a replica.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from spfsplatv2_tpu.ops.rasterizer import RasterizerConfig, RenderOutput, render


def band_intrinsics(intrinsics: jax.Array, row_offset, band_h: int, h: int):
    """Adjust normalized intrinsics so a (band_h, w) render reproduces image
    rows [row_offset, row_offset + band_h) of the full (h, w) render."""
    scale = h / band_h
    fy = intrinsics[..., 1, 1] * scale
    cy = (intrinsics[..., 1, 2] * h - row_offset) / band_h
    out = intrinsics.at[..., 1, 1].set(fy)
    return out.at[..., 1, 2].set(cy)


def render_tile_sharded(
    mesh: Mesh,
    extrinsics: jax.Array,   # (cam, 4, 4)
    intrinsics: jax.Array,   # (cam, 3, 3) normalized
    near: jax.Array,
    far: jax.Array,
    image_shape: tuple[int, int],
    background: jax.Array,   # (cam, 3)
    means: jax.Array,        # (g, 3) shared across cameras
    covariances: jax.Array,
    harmonics: jax.Array,
    opacities: jax.Array,
    cfg: RasterizerConfig = RasterizerConfig(),
    sh_degree: int | None = None,
) -> RenderOutput:
    h, w = image_shape
    n_tile = mesh.shape["tile"]
    assert h % (n_tile * 16) == 0, (
        f"image height {h} must split into 16px tile rows across {n_tile} devices"
    )
    band_h = h // n_tile

    replicated = P()

    def shard_fn(extr, intr, nr, fr, bg, m, c, hm, op):
        row_offset = jax.lax.axis_index("tile") * band_h
        intr_band = band_intrinsics(intr, row_offset, band_h, h)
        out = render(
            extr, intr_band, nr, fr, (band_h, w), bg, m, c, hm, op,
            sh_degree=sh_degree, cfg=cfg, ewa_reference_shape=(h, w),
        )
        return out.color, out.depth, out.alpha

    color, depth, alpha = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(replicated,) * 9,
        out_specs=(
            P(None, "tile", None, None),
            P(None, "tile", None),
            P(None, "tile", None),
        ),
        check_vma=False,
    )(
        extrinsics, intrinsics, near, far, background,
        means, covariances, harmonics, opacities,
    )
    return RenderOutput(color=color, depth=depth, alpha=alpha)
