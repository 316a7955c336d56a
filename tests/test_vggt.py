import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spfsplatv2_tpu.models.encoder_vggt import SPFSplatV2LConfig, SPFSplatV2LEncoder
from spfsplatv2_tpu.models.vggt.aggregator import (
    AggregatorConfig,
    VGGTAggregator,
    global_view_mask,
)
from spfsplatv2_tpu.models.vggt.camera_head import (
    CameraHead,
    CameraHeadConfig,
    fov_to_intrinsics,
    pose_encoding_to_w2c,
)
from spfsplatv2_tpu.models.vggt.dinov2 import DinoV2Config

TINY_DINO = DinoV2Config(
    patch_size=14, embed_dim=32, depth=1, num_heads=2, num_register_tokens=2,
    native_grid=4, compute_dtype="float32",
)
TINY_AGG = AggregatorConfig(
    patch_size=14, embed_dim=32, depth=2, num_heads=2, num_register_tokens=2,
    intrinsics_token=False, dinov2=TINY_DINO, compute_dtype="float32",
)


class TestGlobalMask:
    def test_context_blocked_from_target(self):
        m = np.asarray(global_view_mask(3, 2, num_target=1))
        assert m.shape == (6, 6)
        # context rows (views 0, 1) cannot see target view 2's columns
        assert np.isinf(m[0, 4]) and np.isinf(m[3, 5])
        # but context-context and self are allowed
        assert m[0, 0] == 0 and m[0, 2] == 0
        # target rows see everything
        assert (m[4:] == 0).all()


class TestAggregator:
    def test_forward_shapes(self):
        b, v, h, w = 1, 3, 28, 28
        images = jax.random.uniform(jax.random.PRNGKey(0), (b, v, h, w, 3))
        model = VGGTAggregator(TINY_AGG)
        params = model.init(jax.random.PRNGKey(1), images, None, 1)
        out = model.apply(params, images, None, 1)
        p_total = (h // 14) * (w // 14) + 1 + 2  # patches + camera + registers
        assert len(out["tokens"]) == TINY_AGG.depth
        assert out["tokens"][0].shape == (b, v, p_total, 2 * TINY_AGG.embed_dim)
        assert out["patch_start"] == 3

    def test_target_masking_isolates_context(self):
        b, h, w = 1, 28, 28
        ctx = jax.random.uniform(jax.random.PRNGKey(0), (b, 2, h, w, 3))
        tgt = jax.random.uniform(jax.random.PRNGKey(9), (b, 1, h, w, 3))
        model = VGGTAggregator(TINY_AGG)
        both = jnp.concatenate([ctx, tgt], axis=1)
        params = model.init(jax.random.PRNGKey(1), both, None, 1)
        with_tgt = model.apply(params, both, None, 1)
        ctx_only = model.apply(params, ctx, None, 0)
        for a, c in zip(with_tgt["tokens"], ctx_only["tokens"]):
            np.testing.assert_allclose(a[:, :2], c, atol=1e-5)


class TestCameraHead:
    def test_iterative_refinement_shapes(self):
        cfg = CameraHeadConfig(dim_in=32, trunk_depth=1, num_heads=2)
        head = CameraHead(cfg)
        tokens = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32))
        params = head.init(jax.random.PRNGKey(1), tokens)
        enc = head.apply(params, tokens)
        assert enc.shape == (2, 3, 9)
        assert bool((enc[..., 7:] >= 0).all())  # FoV after relu

    def test_pose_encoding_roundtrip(self):
        # Identity rotation (xyzw: [0,0,0,1]), translation [1,2,3].
        enc = jnp.asarray([[[1.0, 2, 3, 0, 0, 0, 1, 0.9, 0.9]]])
        w2c = pose_encoding_to_w2c(enc)
        np.testing.assert_allclose(w2c[0, 0, :3, :3], jnp.eye(3), atol=1e-6)
        np.testing.assert_allclose(w2c[0, 0, :3, 3], [1, 2, 3], atol=1e-6)
        k = fov_to_intrinsics(enc)
        expected_f = 0.5 / np.tan(0.45)
        np.testing.assert_allclose(k[0, 0, 0, 0], expected_f, rtol=1e-5)
        np.testing.assert_allclose(k[0, 0, 0, 2], 0.5, atol=1e-6)


class TestVGGTEncoder:
    def test_end_to_end_shapes(self):
        cfg = SPFSplatV2LConfig(
            aggregator=TINY_AGG,
            camera_head=CameraHeadConfig(dim_in=64, trunk_depth=1, num_heads=2),
            sh_degree=1,
        )
        model = SPFSplatV2LEncoder(cfg)
        b, vc, vt, h, w = 1, 2, 1, 28, 28
        ctx = jax.random.uniform(jax.random.PRNGKey(0), (b, vc, h, w, 3))
        tgt = jax.random.uniform(jax.random.PRNGKey(1), (b, vt, h, w, 3))
        intr = jnp.broadcast_to(jnp.eye(3), (b, vc, 3, 3))
        intr_t = intr[:, :1]
        params = model.init(jax.random.PRNGKey(2), ctx, intr, tgt, intr_t)
        out = model.apply(params, ctx, intr, tgt, intr_t)
        g = vc * h * w
        assert out["gaussians"].means.shape == (b, g, 3)
        assert out["gaussians"].harmonics.shape == (b, g, 3, 4)
        assert out["extrinsics_cwt"].shape == (b, vc + vt, 4, 4)
        assert out["pts3d"].shape == (b, vc, h, w, 3)
        assert out["pts3d_conf"].shape == (b, vc, h, w)
        for leaf in jax.tree.leaves(out):
            assert bool(jnp.isfinite(jnp.asarray(leaf)).all())
        np.testing.assert_allclose(
            out["extrinsics_cwt"][:, 0], jnp.broadcast_to(jnp.eye(4), (1, 4, 4)),
            atol=1e-5,
        )


class TestVGGTViewDropout:
    """Static-mask view dropout for the VGGT path (10-view v2-l training,
    reference README.md:78-86; mask fork aggregator.py:289-369): masking a
    view must be numerically equivalent to slicing it out."""

    def _setup(self, vc=3, vt=1, h=28, w=28):
        cfg = SPFSplatV2LConfig(
            aggregator=TINY_AGG,
            camera_head=CameraHeadConfig(dim_in=64, trunk_depth=1, num_heads=2),
            sh_degree=1,
        )
        model = SPFSplatV2LEncoder(cfg)
        ctx = jax.random.uniform(jax.random.PRNGKey(0), (1, vc, h, w, 3))
        tgt = jax.random.uniform(jax.random.PRNGKey(1), (1, vt, h, w, 3))
        intr = jnp.broadcast_to(jnp.eye(3), (1, vc, 3, 3))
        intr_t = jnp.broadcast_to(jnp.eye(3), (1, vt, 3, 3))
        params = model.init(jax.random.PRNGKey(2), ctx, intr, tgt, intr_t)
        return model, params, ctx, tgt, intr, intr_t

    def test_masked_context_dropout_matches_sliced(self):
        model, params, ctx, tgt, intr, intr_t = self._setup()
        out_m = model.apply(
            params, ctx, intr, tgt, intr_t,
            context_valid=jnp.asarray([1.0, 0.0, 1.0]),
        )
        keep = [0, 2]
        out_s = model.apply(
            params, ctx[:, keep], intr[:, keep], tgt, intr_t,
        )
        np.testing.assert_allclose(
            np.asarray(out_m["pts3d"][:, keep]),
            np.asarray(out_s["pts3d"]), rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out_m["extrinsics_cwt"][:, [0, 2, 3]]),
            np.asarray(out_s["extrinsics_cwt"]), rtol=2e-4, atol=2e-4,
        )
        # Dropped view's gaussians are transparent; kept views render.
        hw = 28 * 28
        op_m = np.asarray(out_m["gaussians"].opacities).reshape(1, 3, hw)
        assert np.all(op_m[:, 1] == 0.0)
        assert np.all(op_m[:, 0] > 0.0)

    def test_masked_target_dropout_matches_sliced(self):
        model, params, ctx, tgt, intr, intr_t = self._setup(vt=2)
        tgt2, intr_t2 = tgt, intr_t
        out_m = model.apply(
            params, ctx, intr, tgt2, intr_t2,
            target_valid=jnp.asarray([1.0, 0.0]),
        )
        out_s = model.apply(
            params, ctx, intr, tgt2[:, :1], intr_t2[:, :1],
        )
        np.testing.assert_allclose(
            np.asarray(out_m["pts3d"]), np.asarray(out_s["pts3d"]),
            rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out_m["extrinsics_cwt"][:, [0, 1, 2, 3]]),
            np.asarray(out_s["extrinsics_cwt"]), rtol=2e-4, atol=2e-4,
        )
