import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spfsplatv2_tpu.ops.covariance import build_covariance
from spfsplatv2_tpu.ops.raster_common import project_gaussians
from spfsplatv2_tpu.ops.raster_ref import composite_reference
from spfsplatv2_tpu.ops.raster_tiled import bin_gaussians, composite_tiles
from spfsplatv2_tpu.ops.rasterizer import RasterizerConfig, render


def make_scene(key, n=200, d_sh=25):
    """Random Gaussians in front of an identity camera."""
    keys = jax.random.split(key, 6)
    means = jnp.concatenate(
        [
            jax.random.uniform(keys[0], (n, 2), minval=-0.8, maxval=0.8),
            jax.random.uniform(keys[1], (n, 1), minval=1.5, maxval=6.0),
        ],
        axis=-1,
    )
    scales = 0.02 + 0.05 * jax.random.uniform(keys[2], (n, 3))
    quats = jax.random.normal(keys[3], (n, 4))
    covs = build_covariance(scales, quats)
    harmonics = 0.5 * jax.random.normal(keys[4], (n, 3, d_sh))
    opacities = jax.random.uniform(keys[5], (n,), minval=0.3, maxval=0.95)
    return means, covs, harmonics, opacities


CAMERA_K = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])


def assert_images_close(actual, desired, atol=2e-5, frac=0.999, hard_atol=5e-3):
    """Allclose for rasterized images.

    Pixels sitting exactly on the T=1e-4 early-termination threshold can flip
    their break decision under different f32 reduction orders (chunked vs
    full cumprod) — identical behavior exists between CUDA runs. Require
    `frac` of pixels within `atol` and ALL pixels within `hard_atol`.
    """
    diff = np.abs(np.asarray(actual) - np.asarray(desired))
    assert diff.max() <= hard_atol, f"hard max diff {diff.max()}"
    ok = (diff <= atol).mean()
    assert ok >= frac, f"only {ok:.4%} of pixels within {atol}"


class TestProjection:
    def test_center_gaussian_projects_to_center(self):
        h = w = 64
        means = jnp.asarray([[0.0, 0.0, 2.0]])
        covs = jnp.eye(3)[None] * 0.01
        harm = jnp.zeros((1, 3, 1))
        op = jnp.ones((1,))
        proj = project_gaussians(
            means, covs, harm, op, jnp.eye(4), CAMERA_K, (h, w)
        )
        np.testing.assert_allclose(
            proj.xy[0], [(w - 1) / 2, (h - 1) / 2], atol=1e-4
        )
        assert int(proj.radius[0]) > 0
        np.testing.assert_allclose(proj.depth[0], 2.0, atol=1e-6)

    def test_behind_camera_culled(self):
        means = jnp.asarray([[0.0, 0.0, -2.0], [0.0, 0.0, 0.1]])
        covs = jnp.broadcast_to(jnp.eye(3) * 0.01, (2, 3, 3))
        proj = project_gaussians(
            means, covs, jnp.zeros((2, 3, 1)), jnp.ones((2,)),
            jnp.eye(4), CAMERA_K, (32, 32),
        )
        assert int(proj.radius[0]) == 0
        assert int(proj.radius[1]) == 0  # inside the 0.2 near cull


class TestCompositing:
    def test_tiled_matches_reference(self):
        h = w = 64
        means, covs, harm, op = make_scene(jax.random.PRNGKey(0), n=300)
        bg = jnp.asarray([0.1, 0.2, 0.3])
        proj = project_gaussians(
            means, covs, harm, op, jnp.eye(4), CAMERA_K, (h, w)
        )
        ref_c, ref_d, ref_a = composite_reference(proj, (h, w), bg)
        bins = bin_gaussians(proj, (h, w), max_tiles_per_gaussian=64)
        til_c, til_d, til_a = composite_tiles(
            proj, bins, (h, w), bg, max_per_tile=512
        )
        assert_images_close(til_c, ref_c, atol=2e-5)
        assert_images_close(til_d, ref_d, atol=2e-4, hard_atol=2e-2)
        assert_images_close(til_a, ref_a, atol=2e-5)

    def test_empty_scene_gives_background(self):
        h = w = 32
        bg = jnp.asarray([0.5, 0.6, 0.7])
        out = render(
            jnp.eye(4)[None], CAMERA_K[None], jnp.ones((1,)) * 0.5,
            jnp.ones((1,)) * 100.0, (h, w), bg[None],
            jnp.asarray([[[0.0, 0.0, -5.0]]]),  # behind camera
            jnp.eye(3)[None, None] * 0.01,
            jnp.zeros((1, 1, 3, 1)), jnp.ones((1, 1)),
            cfg=RasterizerConfig(scale_invariant=False),
        )
        np.testing.assert_allclose(
            out.color[0], jnp.broadcast_to(bg, (h, w, 3)), atol=1e-6
        )
        np.testing.assert_allclose(out.alpha[0], jnp.zeros((h, w)), atol=1e-6)

    def test_occlusion_order(self):
        # A near opaque red gaussian must occlude a far green one.
        h = w = 32
        means = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, 4.0]])
        covs = jnp.broadcast_to(jnp.eye(3) * 0.05, (2, 3, 3))
        # d_sh=1, DC-only colors: solve for red/green after +0.5 clamp.
        from spfsplatv2_tpu.ops.sh import C0

        harm = jnp.asarray(
            [[[0.5 / C0], [-0.5 / C0], [-0.5 / C0]],
             [[-0.5 / C0], [0.5 / C0], [-0.5 / C0]]]
        )
        op = jnp.asarray([0.99, 0.99])
        proj = project_gaussians(
            means, covs, harm, op, jnp.eye(4), CAMERA_K, (h, w)
        )
        color, depth, alpha = composite_reference(
            proj, (h, w), jnp.zeros((3,))
        )
        center = color[h // 2, w // 2]
        assert float(center[0]) > 0.9  # red wins
        assert float(center[1]) < 0.1
        assert 1.9 < float(depth[h // 2, w // 2]) < 2.3

    def test_transmittance_break_matches(self):
        # Stack many opaque gaussians at the same spot: early-termination
        # semantics must agree between reference and tiled paths.
        h = w = 16
        n = 50
        means = jnp.concatenate(
            [jnp.zeros((n, 2)), jnp.linspace(1.0, 3.0, n)[:, None]], axis=-1
        )
        covs = jnp.broadcast_to(jnp.eye(3) * 0.05, (n, 3, 3))
        harm = jax.random.normal(jax.random.PRNGKey(1), (n, 3, 1))
        op = jnp.full((n,), 0.9)
        bg = jnp.zeros((3,))
        proj = project_gaussians(means, covs, harm, op, jnp.eye(4), CAMERA_K, (h, w))
        ref = composite_reference(proj, (h, w), bg)
        bins = bin_gaussians(proj, (h, w), max_tiles_per_gaussian=16)
        til = composite_tiles(proj, bins, (h, w), bg, max_per_tile=128)
        for r, t in zip(ref, til):
            assert_images_close(t, r, atol=2e-5)


class TestGradients:
    def _loss(self, backend):
        h = w = 32
        means, covs, harm, op = make_scene(jax.random.PRNGKey(2), n=50, d_sh=4)
        bg = jnp.asarray([0.0, 0.0, 0.0])
        target = jax.random.uniform(jax.random.PRNGKey(3), (h, w, 3))

        def loss_fn(means, covs, harm, op, c2w):
            out = render(
                c2w[None], CAMERA_K[None], jnp.ones((1,)),
                jnp.full((1,), 100.0), (h, w), bg[None],
                means[None], covs[None], harm[None], op[None],
                cfg=RasterizerConfig(
                    backend=backend, scale_invariant=False, max_per_tile=128,
                    chunk=64,
                ),
            )
            return jnp.mean((out.color[0] - target) ** 2)

        return jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
            means, covs, harm, op, jnp.eye(4)
        )

    def test_grads_match_reference(self):
        g_ref = self._loss("reference")
        g_til = self._loss("tiled")
        names = ["means", "covs", "harmonics", "opacity", "pose"]
        for name, a, b in zip(names, g_ref, g_til):
            np.testing.assert_allclose(b, a, atol=1e-5, err_msg=name)

    def test_pose_gradient_nonzero(self):
        # The diff_gauss_pose fork's key feature: gradients flow to the camera.
        grads = self._loss("tiled")
        pose_grad = grads[4]
        assert float(jnp.abs(pose_grad).max()) > 0.0

    def test_finite_difference_means(self):
        # Central finite differences on a smooth pixel vs autodiff.
        h = w = 16
        means = jnp.asarray([[0.05, -0.03, 2.0]])
        covs = jnp.eye(3)[None] * 0.05
        harm = jnp.ones((1, 3, 1))
        op = jnp.asarray([0.8])
        bg = jnp.zeros((3,))

        def f(m):
            proj = project_gaussians(
                m, covs, harm, op, jnp.eye(4), CAMERA_K, (h, w)
            )
            c, _, _ = composite_reference(proj, (h, w), bg)
            return jnp.sum(c[6:10, 6:10])

        g = jax.grad(f)(means)
        eps = 1e-4
        for i in range(3):
            dm = jnp.zeros_like(means).at[0, i].set(eps)
            fd = (f(means + dm) - f(means - dm)) / (2 * eps)
            np.testing.assert_allclose(g[0, i], fd, rtol=2e-2, atol=1e-3)


class TestBatchedRender:
    def test_batched_cameras_shared_gaussians(self):
        h = w = 32
        means, covs, harm, op = make_scene(jax.random.PRNGKey(4), n=80, d_sh=1)
        c2w = jnp.stack([jnp.eye(4), jnp.eye(4).at[0, 3].set(0.2)])
        out = render(
            c2w, jnp.stack([CAMERA_K] * 2), jnp.ones((2,)),
            jnp.full((2,), 100.0), (h, w), jnp.zeros((2, 3)),
            means, covs, harm, op,
            cfg=RasterizerConfig(scale_invariant=False, max_per_tile=256),
        )
        assert out.color.shape == (2, h, w, 3)
        assert out.depth.shape == (2, h, w)
        # Different viewpoints produce different images.
        assert float(jnp.abs(out.color[0] - out.color[1]).max()) > 1e-3

    def test_scale_invariant_mode(self):
        # Rendering with scale_invariant=True must match a manual 1/near
        # world rescale (colors identical, depth scaled).
        h = w = 32
        means, covs, harm, op = make_scene(jax.random.PRNGKey(5), n=60, d_sh=1)
        near = jnp.asarray([0.5])
        kwargs = dict(sh_degree=0)
        out_si = render(
            jnp.eye(4)[None], CAMERA_K[None], near, jnp.full((1,), 100.0),
            (h, w), jnp.zeros((1, 3)), means, covs, harm, op,
            cfg=RasterizerConfig(scale_invariant=True, max_per_tile=256),
            **kwargs,
        )
        s = 1.0 / near[0]
        out_manual = render(
            jnp.eye(4)[None].at[0, :3, 3].mul(s), CAMERA_K[None],
            near * s, jnp.full((1,), 100.0) * s,
            (h, w), jnp.zeros((1, 3)),
            means * s, covs * s**2, harm, op,
            cfg=RasterizerConfig(scale_invariant=False, max_per_tile=256),
            **kwargs,
        )
        np.testing.assert_allclose(out_si.color, out_manual.color, atol=1e-5)
        np.testing.assert_allclose(out_si.depth, out_manual.depth, atol=1e-4)
