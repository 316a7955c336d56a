import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spfsplatv2_tpu.geometry import se3, projection


def random_rotations(key, n):
    q = jax.random.normal(key, (n, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return se3.quaternion_to_matrix(q), q


class TestRotations:
    def test_quat_matrix_roundtrip(self):
        r, q = random_rotations(jax.random.PRNGKey(0), 64)
        q2 = se3.matrix_to_quaternion(r)
        # q and -q are the same rotation; matrix_to_quaternion returns w >= 0.
        q_canon = jnp.where(q[:, :1] < 0, -q, q)
        np.testing.assert_allclose(q2, q_canon, atol=1e-5)

    def test_quaternion_matrix_orthonormal(self):
        r, _ = random_rotations(jax.random.PRNGKey(1), 32)
        eye = jnp.broadcast_to(jnp.eye(3), r.shape)
        np.testing.assert_allclose(r @ jnp.swapaxes(r, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(r), jnp.ones(32), atol=1e-5)

    def test_rotation_6d(self):
        r, _ = random_rotations(jax.random.PRNGKey(2), 16)
        d6 = se3.matrix_to_rotation_6d(r)
        r2 = se3.rotation_6d_to_matrix(d6)
        np.testing.assert_allclose(r2, r, atol=1e-5)

    def test_rotation_6d_identity_init(self):
        # The pose head init [1,0,0,0,1,0] must decode to identity
        # (reference: src/model/encoder/heads/pose_head.py:65-74).
        d6 = jnp.asarray([1.0, 0, 0, 0, 1.0, 0])
        np.testing.assert_allclose(se3.rotation_6d_to_matrix(d6), jnp.eye(3), atol=1e-6)

    def test_so3_exp_small_angle(self):
        theta = jnp.asarray([[1e-8, 0, 0], [0.0, 0, 0]])
        r = se3.so3_exp(theta)
        np.testing.assert_allclose(r, jnp.broadcast_to(jnp.eye(3), (2, 3, 3)), atol=1e-6)

    def test_so3_exp_90deg(self):
        theta = jnp.asarray([0.0, 0.0, jnp.pi / 2])
        r = se3.so3_exp(theta)
        expected = jnp.asarray([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
        np.testing.assert_allclose(r, expected, atol=1e-6)


class TestPoses:
    def test_inverse_se3(self):
        r, _ = random_rotations(jax.random.PRNGKey(3), 8)
        t = jax.random.normal(jax.random.PRNGKey(4), (8, 3))
        m = se3.pack_rt(r, t)
        np.testing.assert_allclose(
            se3.inverse_se3(m) @ m, jnp.broadcast_to(jnp.eye(4), (8, 4, 4)), atol=1e-5
        )

    def test_camera_normalization(self):
        r, _ = random_rotations(jax.random.PRNGKey(5), 4)
        t = jax.random.normal(jax.random.PRNGKey(6), (4, 3))
        poses = se3.pack_rt(r, t)
        normed = se3.camera_normalization(poses[:1], poses)
        np.testing.assert_allclose(normed[0], jnp.eye(4), atol=1e-5)

    def test_pose_encoding_roundtrip(self):
        r, _ = random_rotations(jax.random.PRNGKey(7), 4)
        t = jax.random.normal(jax.random.PRNGKey(8), (4, 3))
        enc = jnp.concatenate([se3.matrix_to_rotation_6d(r), t], axis=-1)
        m = se3.pose_encoding_to_matrix(enc)
        np.testing.assert_allclose(m, se3.pack_rt(r, t), atol=1e-5)

    def test_pose_auc_perfect(self):
        aucs = se3.pose_auc(np.zeros(10), [5, 10, 20])
        assert all(a > 0.99 for a in aucs)

    def test_rotation_angle(self):
        theta = jnp.asarray([0.0, 0.0, jnp.radians(30.0)])
        r = se3.so3_exp(theta)
        ang = se3.rotation_angle_deg(r[None], jnp.eye(3)[None])
        np.testing.assert_allclose(ang, [30.0], rtol=1e-4)


class TestProjection:
    def setup_method(self):
        self.k = jnp.asarray([[1.2, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1.0]])

    def test_project_unproject_roundtrip(self):
        coords, _ = projection.sample_image_grid((8, 8))
        coords = coords.reshape(-1, 2)
        pts = projection.unproject(coords, jnp.full((64,), 2.0), self.k)
        xy, valid = projection.project(pts, self.k)
        assert bool(valid.all())
        np.testing.assert_allclose(xy, coords, atol=1e-5)

    def test_world_rays_at_identity(self):
        coords = jnp.asarray([[0.5, 0.5]])
        origins, dirs = projection.get_world_rays(coords, jnp.eye(4), self.k)
        np.testing.assert_allclose(origins, jnp.zeros((1, 3)), atol=1e-6)
        np.testing.assert_allclose(dirs, jnp.asarray([[0.0, 0, 1]]), atol=1e-5)

    def test_fov(self):
        fov = projection.get_fov(self.k[None])
        expected = 2 * np.arctan(0.5 / 1.2)
        np.testing.assert_allclose(fov, [[expected, expected]], rtol=1e-5)

    def test_project_to_cam_grid(self):
        # Points unprojected from pixel centers must land back on them.
        h = w = 16
        coords, _ = projection.sample_image_grid((h, w))
        k_px = projection.unnormalize_intrinsics(self.k, (h, w))
        pts_cam = projection.unproject(
            coords.reshape(-1, 2), jnp.full((h * w,), 3.0), self.k
        )
        px = se3.project_to_cam(pts_cam[None], jnp.eye(4)[None], k_px[None])
        expected = coords.reshape(-1, 2) * jnp.asarray([w, h])
        np.testing.assert_allclose(px[0], expected, atol=1e-4)

    def test_depth_from_pose(self):
        pts = jnp.asarray([[[0.0, 0, 5.0], [1.0, 1, 2.0]]])
        d = se3.depth_from_pose(pts, jnp.eye(4)[None])
        np.testing.assert_allclose(d, [[5.0, 2.0]], atol=1e-6)


class TestSH:
    def test_orthonormality(self):
        # Monte-Carlo check that the degree-4 basis is orthonormal on S^2.
        from spfsplatv2_tpu.ops.sh import sh_basis

        key = jax.random.PRNGKey(0)
        dirs = jax.random.normal(key, (200_000, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        basis = sh_basis(dirs, 4)  # (n, 25)
        gram = (basis.T @ basis) * (4 * jnp.pi / dirs.shape[0])
        np.testing.assert_allclose(gram, jnp.eye(25), atol=0.05)

    def test_dc_only(self):
        from spfsplatv2_tpu.ops.sh import eval_sh_colors, C0

        harmonics = jnp.zeros((5, 3, 25)).at[:, :, 0].set(1.0)
        dirs = jax.random.normal(jax.random.PRNGKey(1), (5, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        colors = eval_sh_colors(harmonics, dirs)
        np.testing.assert_allclose(colors, jnp.full((5, 3), C0 + 0.5), atol=1e-6)


class TestGaussians:
    def test_build_covariance(self):
        from spfsplatv2_tpu.ops.covariance import build_covariance

        scale = jnp.asarray([1.0, 2.0, 3.0])
        quat = jnp.asarray([1.0, 0, 0, 0])
        cov = build_covariance(scale, quat)
        np.testing.assert_allclose(cov, jnp.diag(scale**2), atol=1e-6)

    def test_covariance_psd(self):
        from spfsplatv2_tpu.ops.covariance import build_covariance

        key = jax.random.PRNGKey(0)
        scale = jax.nn.softplus(jax.random.normal(key, (32, 3)))
        quat = jax.random.normal(jax.random.PRNGKey(1), (32, 4))
        cov = build_covariance(scale, quat)
        eigs = jnp.linalg.eigvalsh(cov)
        assert bool((eigs > -1e-6).all())

    def test_pytree_flatten(self):
        from spfsplatv2_tpu.gaussians import Gaussians

        g = Gaussians(
            means=jnp.zeros((2, 3, 4, 3)),
            covariances=jnp.zeros((2, 3, 4, 3, 3)),
            scales=jnp.zeros((2, 3, 4, 3)),
            rotations=jnp.zeros((2, 3, 4, 4)),
            harmonics=jnp.zeros((2, 3, 4, 3, 25)),
            opacities=jnp.zeros((2, 3, 4)),
        )
        flat = g.flatten_views()
        assert flat.means.shape == (2, 12, 3)
        assert flat.harmonics.shape == (2, 12, 3, 25)
        assert g.sh_degree == 4
        leaves = jax.tree.leaves(g)
        assert len(leaves) == 6
