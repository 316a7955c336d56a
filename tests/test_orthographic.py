"""Orthographic decoder (reference cuda_splatting.py:146-255)."""

import jax.numpy as jnp
import numpy as np

from spfsplatv2_tpu.gaussians import Gaussians
from spfsplatv2_tpu.models.decoder import DecoderConfig, decode_orthographic
from spfsplatv2_tpu.ops.covariance import build_covariance
from spfsplatv2_tpu.ops.rasterizer import RasterizerConfig


def _scene(offsets_xy, depths):
    g = len(depths)
    means = jnp.asarray(
        [[x, y, z] for (x, y), z in zip(offsets_xy, depths)], jnp.float32
    )
    scales = jnp.full((g, 3), 0.05)
    quats = jnp.concatenate([jnp.ones((g, 1)), jnp.zeros((g, 3))], axis=-1)
    covs = build_covariance(scales, quats)
    harm = jnp.full((g, 3, 1), 2.0)
    opac = jnp.full((g,), 0.95)
    return Gaussians(
        means=means[None], covariances=covs[None], scales=scales[None],
        rotations=quats[None], harmonics=harm[None], opacities=opac[None],
    )


class TestOrthographic:
    def test_depth_invariant_projection(self):
        """Parallel rays: the same (x, y) at different z lands on the same
        pixel (the defining property of an orthographic projection)."""
        h = w = 64
        cfg = DecoderConfig(
            make_scale_invariant=False,
            rasterizer=RasterizerConfig(backend="tiled", max_per_tile=128,
                                        chunk=128, max_tiles_per_gaussian=16),
        )
        e = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
        nearfar = (jnp.full((1, 1), 0.1), jnp.full((1, 1), 10.0))
        wh = (jnp.full((1, 1), 2.0), jnp.full((1, 1), 2.0))

        def centroid(z):
            out = decode_orthographic(
                _scene([(0.5, -0.3)], [z]), e, wh[0], wh[1], *nearfar,
                (h, w), cfg,
            )
            img = np.asarray(out.color[0, 0]).sum(-1)
            ys, xs = np.nonzero(img > img.max() * 0.5)
            return ys.mean(), xs.mean()

        c1, c2 = centroid(1.0), centroid(5.0)
        assert abs(c1[0] - c2[0]) < 1.5 and abs(c1[1] - c2[1]) < 1.5, (c1, c2)

    def test_world_width_sets_scale(self):
        """Doubling the world-space view width halves the on-screen offset."""
        h = w = 64
        cfg = DecoderConfig(
            make_scale_invariant=False,
            rasterizer=RasterizerConfig(backend="tiled", max_per_tile=128,
                                        chunk=128, max_tiles_per_gaussian=16),
        )
        e = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
        near, far = jnp.full((1, 1), 0.1), jnp.full((1, 1), 10.0)

        def x_offset(width_world):
            wh = jnp.full((1, 1), width_world)
            out = decode_orthographic(
                _scene([(0.5, 0.0)], [2.0]), e, wh, wh, near, far, (h, w), cfg,
            )
            img = np.asarray(out.color[0, 0]).sum(-1)
            _, xs = np.nonzero(img > img.max() * 0.5)
            return xs.mean() - (w - 1) / 2

        off2, off4 = x_offset(2.0), x_offset(4.0)
        assert 1.6 < off2 / off4 < 2.4, (off2, off4)
