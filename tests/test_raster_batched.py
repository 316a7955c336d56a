"""Batched multi-camera rasterizer path vs the per-camera oracle.

The pallas backend routes ALL cameras through one flat pipeline
(bin_gaussians_batched + composite_pallas_batched, grid = cam * tiles);
these tests pin that path — values and gradients — against the dense
reference compositor evaluated camera by camera.
"""

import jax
import jax.numpy as jnp
import numpy as np

from spfsplatv2_tpu.geometry.se3 import se3_exp
from spfsplatv2_tpu.ops.raster_common import project_gaussians
from spfsplatv2_tpu.ops.raster_pallas import composite_pallas_batched
from spfsplatv2_tpu.ops.raster_ref import composite_reference
from spfsplatv2_tpu.ops.raster_tiled import bin_gaussians_batched
from spfsplatv2_tpu.ops.rasterizer import RasterizerConfig, render

from test_rasterizer import CAMERA_K, assert_images_close, make_scene


def make_cameras(n_cam):
    """Distinct poses looking roughly down +z."""
    twists = 0.08 * jnp.sin(jnp.arange(n_cam * 6, dtype=jnp.float32)).reshape(
        n_cam, 6
    )
    return jax.vmap(se3_exp)(twists)  # (cam, 4, 4)


class TestBatchedComposite:
    def test_matches_reference_per_camera(self):
        h = w = 48
        n_cam = 3
        means, covs, harm, op = make_scene(jax.random.PRNGKey(3), n=300)
        c2w = make_cameras(n_cam)
        intr = jnp.broadcast_to(CAMERA_K, (n_cam, 3, 3))
        bg = jnp.zeros((n_cam, 3))

        project = lambda e, k: project_gaussians(  # noqa: E731
            means, covs, harm, op, e, k, (h, w)
        )
        proj_b = jax.vmap(project)(c2w, intr)
        bins = bin_gaussians_batched(proj_b, (h, w), 16)
        color, depth, alpha = composite_pallas_batched(
            proj_b, bins, (h, w), bg, chunk=64, max_per_tile=256,
            interpret=True,
        )

        for i in range(n_cam):
            proj_i = jax.tree.map(lambda x: x[i], proj_b)
            c_ref, d_ref, a_ref = composite_reference(
                proj_i, (h, w), bg[i]
            )
            assert_images_close(color[i], c_ref, atol=3e-5)
            assert_images_close(depth[i], d_ref, atol=3e-4, hard_atol=2e-2)
            assert_images_close(alpha[i], a_ref, atol=3e-5)

    def test_gradients_match_reference(self):
        h = w = 32
        n_cam = 2
        means, covs, harm, op = make_scene(jax.random.PRNGKey(5), n=120)
        c2w = make_cameras(n_cam)
        intr = jnp.broadcast_to(CAMERA_K, (n_cam, 3, 3))
        bg = jnp.zeros((n_cam, 3))
        target = jax.random.uniform(jax.random.PRNGKey(7), (n_cam, h, w, 3))

        def loss_batched(m, o, e):
            project = lambda ee, k: project_gaussians(  # noqa: E731
                m, covs, harm, o, ee, k, (h, w)
            )
            proj_b = jax.vmap(project)(e, intr)
            bins = bin_gaussians_batched(proj_b, (h, w), 16)
            color, _, _ = composite_pallas_batched(
                proj_b, bins, (h, w), bg, chunk=64, max_per_tile=256,
                interpret=True,
            )
            return jnp.sum((color - target) ** 2)

        def loss_ref(m, o, e):
            total = 0.0
            for i in range(n_cam):
                proj = project_gaussians(
                    m, covs, harm, o, e[i], intr[i], (h, w)
                )
                c, _, _ = composite_reference(proj, (h, w), bg[i])
                total = total + jnp.sum((c - target[i]) ** 2)
            return total

        gb = jax.grad(loss_batched, argnums=(0, 1, 2))(means, op, c2w)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(means, op, c2w)
        for a, b, name in zip(gb, gr, ["means", "opacity", "pose"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4,
                err_msg=f"grad mismatch: {name}",
            )


class TestRenderBatchedBackend:
    def test_render_pallas_matches_tiled(self):
        h = w = 48
        n_cam = 2
        means, covs, harm, op = make_scene(jax.random.PRNGKey(11), n=250)
        c2w = make_cameras(n_cam)
        intr = jnp.broadcast_to(CAMERA_K, (n_cam, 3, 3))
        near = jnp.full((n_cam,), 0.5)
        far = jnp.full((n_cam,), 50.0)
        bg = jnp.zeros((n_cam, 3))

        kw = dict(
            near=near, far=far, image_shape=(h, w), background=bg,
            means=means, covariances=covs, harmonics=harm, opacities=op,
        )
        out_p = render(
            c2w, intr, cfg=RasterizerConfig(backend="pallas_batched", chunk=64,
                                            max_per_tile=256), **kw
        )
        out_t = render(
            c2w, intr, cfg=RasterizerConfig(backend="tiled", chunk=64,
                                            max_per_tile=256), **kw
        )
        for i in range(n_cam):
            assert_images_close(out_p.color[i], out_t.color[i], atol=3e-5)
            assert_images_close(out_p.alpha[i], out_t.alpha[i], atol=3e-5)
