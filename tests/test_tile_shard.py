import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spfsplatv2_tpu.ops.rasterizer import RasterizerConfig, render
from spfsplatv2_tpu.parallel import make_mesh
from spfsplatv2_tpu.parallel.raster_shard import (
    band_intrinsics,
    render_tile_sharded,
)

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from test_rasterizer import CAMERA_K, assert_images_close, make_scene  # noqa: E402


class TestBandIntrinsics:
    def test_band_math(self):
        # Points projecting to global row r must project to row r - off in
        # the band camera.
        from spfsplatv2_tpu.ops.raster_common import project_gaussians

        h = w = 64
        band_h, off = 16, 32
        means, covs, harm, op = make_scene(jax.random.PRNGKey(0), n=40, d_sh=1)
        full = project_gaussians(
            means, covs, harm, op, jnp.eye(4), CAMERA_K, (h, w)
        )
        k_band = band_intrinsics(CAMERA_K, off, band_h, h)
        band = project_gaussians(
            means, covs, harm, op, jnp.eye(4), k_band, (band_h, w),
            ewa_reference_shape=(h, w),
        )
        np.testing.assert_allclose(
            band.xy[:, 1], full.xy[:, 1] - off, atol=1e-3
        )
        np.testing.assert_allclose(band.xy[:, 0], full.xy[:, 0], atol=1e-4)
        # Conic (pixel-space curvature) is unchanged.
        np.testing.assert_allclose(band.conic, full.conic, rtol=1e-4)


class TestTileShardedRender:
    def test_matches_single_device(self):
        mesh = make_mesh(n_data=2, n_tile=4)
        h = w = 64
        means, covs, harm, op = make_scene(jax.random.PRNGKey(1), n=120, d_sh=1)
        c2w = jnp.stack([jnp.eye(4), jnp.eye(4).at[0, 3].set(0.15)])
        intr = jnp.stack([CAMERA_K] * 2)
        near = jnp.ones((2,))
        far = jnp.full((2,), 100.0)
        bg = jnp.zeros((2, 3))
        cfg = RasterizerConfig(scale_invariant=False, max_per_tile=512)

        single = render(
            c2w, intr, near, far, (h, w), bg, means, covs, harm, op, cfg=cfg
        )
        with mesh:
            sharded = render_tile_sharded(
                mesh, c2w, intr, near, far, (h, w), bg,
                means, covs, harm, op, cfg=cfg,
            )
        assert sharded.color.shape == (2, h, w, 3)
        assert_images_close(sharded.color, single.color, atol=1e-4)
        assert_images_close(sharded.alpha, single.alpha, atol=1e-4)
        assert_images_close(
            sharded.depth, single.depth, atol=1e-3, hard_atol=2e-2
        )

    def test_gradients_flow_through_shard_map(self):
        mesh = make_mesh(n_data=1, n_tile=2)
        h = w = 32
        means, covs, harm, op = make_scene(jax.random.PRNGKey(2), n=50, d_sh=1)
        c2w = jnp.eye(4)[None]
        intr = CAMERA_K[None]
        cfg = RasterizerConfig(scale_invariant=False, max_per_tile=256)

        def loss(m):
            with mesh:
                out = render_tile_sharded(
                    mesh, c2w, intr, jnp.ones((1,)), jnp.full((1,), 100.0),
                    (h, w), jnp.zeros((1, 3)), m, covs, harm, op, cfg=cfg,
                )
            return jnp.mean(out.color**2)

        g = jax.grad(loss)(means)
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).max()) > 0
