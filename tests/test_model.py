import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spfsplatv2_tpu.models.croco.backbone import (
    CrocoBackboneConfig,
    MaskedCrocoBackbone,
    build_cross_view_mask,
)
from spfsplatv2_tpu.models.encoder import SPFSplatV2Config, SPFSplatV2Encoder
from spfsplatv2_tpu.models.heads.pose_head import PoseHead, PoseHeadConfig

TINY = CrocoBackboneConfig(
    patch_size=16,
    enc_depth=2,
    enc_embed_dim=64,
    enc_num_heads=4,
    dec_depth=4,
    dec_embed_dim=48,
    dec_num_heads=4,
    compute_dtype="float32",
)


class TestMask:
    def test_context_cannot_see_target(self):
        m = np.asarray(build_cross_view_mask(4, num_target=2))
        # context rows 0,1 may see each other but not targets 2,3
        assert m[0, 1] == 0 and m[1, 0] == 0
        assert np.isinf(m[0, 2]) and np.isinf(m[0, 3])
        assert np.isinf(m[1, 2]) and np.isinf(m[1, 3])
        # target rows see everything but themselves
        assert m[2, 0] == 0 and m[2, 1] == 0 and m[2, 3] == 0
        assert np.isinf(m[2, 2]) and np.isinf(m[3, 3])
        # no self-attention anywhere
        assert np.isinf(np.diag(m)).all()

    def test_traced_num_target(self):
        # One compiled graph must serve different context/target splits.
        f = jax.jit(lambda nt: build_cross_view_mask(4, nt))
        m1, m2 = np.asarray(f(1)), np.asarray(f(2))
        assert np.isinf(m1[0, 3]) and not np.isinf(m1[0, 2])
        assert np.isinf(m2[0, 2])


class TestBackbone:
    def test_forward_shapes(self):
        b, v, h, w = 1, 3, 32, 32
        images = jax.random.uniform(jax.random.PRNGKey(0), (b, v, h, w, 3))
        intr = jnp.broadcast_to(jnp.eye(3), (b, v, 3, 3))
        model = MaskedCrocoBackbone(TINY)
        params = model.init(jax.random.PRNGKey(1), images, intr, 1)
        out = model.apply(params, images, intr, 1)
        p = (h // 16) * (w // 16)
        assert len(out["dec_feat"]) == TINY.dec_depth + 1
        assert out["dec_feat"][0].shape == (b, v, p, TINY.enc_embed_dim)
        assert out["dec_feat"][-1].shape == (b, v, p, TINY.dec_embed_dim)
        assert out["pose_feat"][-1].shape == (b, v, 1, TINY.dec_embed_dim)

    def test_target_masking_isolates_context(self):
        """Context outputs must be IDENTICAL whether target views are
        present or not — the core masked-attention guarantee
        (reference backbone_masked_croco.py:277-302)."""
        b, h, w = 1, 32, 32
        key = jax.random.PRNGKey(0)
        ctx = jax.random.uniform(key, (b, 2, h, w, 3))
        tgt = jax.random.uniform(jax.random.PRNGKey(9), (b, 1, h, w, 3))
        intr3 = jnp.broadcast_to(jnp.eye(3), (b, 3, 3, 3))
        intr2 = intr3[:, :2]

        model = MaskedCrocoBackbone(TINY)
        both = jnp.concatenate([ctx, tgt], axis=1)
        params = model.init(jax.random.PRNGKey(1), both, intr3, 1)

        out_with_tgt = model.apply(params, both, intr3, 1)
        out_ctx_only = model.apply(params, ctx, intr2, 0)
        for a, c in zip(out_with_tgt["dec_feat"], out_ctx_only["dec_feat"]):
            np.testing.assert_allclose(a[:, :2], c, atol=1e-5)

    def test_dual_decoder_asymmetry(self):
        # Swapping two non-zero views changes nothing for view 0, but view 0
        # and view 1 use different decoder weights: permuting view 0 with
        # view 1 must NOT be equivariant.
        b, h, w = 1, 32, 32
        images = jax.random.uniform(jax.random.PRNGKey(2), (b, 3, h, w, 3))
        intr = jnp.broadcast_to(jnp.eye(3), (b, 3, 3, 3))
        model = MaskedCrocoBackbone(TINY)
        params = model.init(jax.random.PRNGKey(3), images, intr, 0)
        out = model.apply(params, images, intr, 0)
        swapped = model.apply(params, images[:, [1, 0, 2]], intr, 0)
        a = out["dec_feat"][-1][:, 0]
        b_ = swapped["dec_feat"][-1][:, 1]
        assert float(jnp.abs(a - b_).max()) > 1e-4


class TestPoseHead:
    def test_identity_init(self):
        head = PoseHead(PoseHeadConfig(init_t=True))
        tokens = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 48))
        params = head.init(jax.random.PRNGKey(1), tokens)
        out = head.apply(params, tokens)
        # zero-init weights + identity bias -> identity pose encoding
        np.testing.assert_allclose(
            out, jnp.broadcast_to(jnp.asarray([1, 0, 0, 0, 1, 0, 0, 0, 0.0]), (2, 9)),
            atol=1e-6,
        )

    def test_homogeneous_translation(self):
        head = PoseHead(PoseHeadConfig(init_t=False, use_homogeneous=True))
        tokens = jax.random.normal(jax.random.PRNGKey(0), (4, 1, 32))
        params = head.init(jax.random.PRNGKey(1), tokens)
        out = head.apply(params, tokens)
        assert out.shape == (4, 9)
        assert bool(jnp.isfinite(out).all())


class TestEncoder:
    def _make(self):
        cfg = SPFSplatV2Config(
            backbone=TINY, sh_degree=1,
            dpt_feature_dim=32, dpt_last_dim=16, dpt_layer_dims=(16, 24, 32, 48),
        )
        model = SPFSplatV2Encoder(cfg)
        b, vc, vt, h, w = 1, 2, 1, 32, 32
        ctx = jax.random.uniform(jax.random.PRNGKey(0), (b, vc, h, w, 3))
        tgt = jax.random.uniform(jax.random.PRNGKey(1), (b, vt, h, w, 3))
        intr = jnp.broadcast_to(
            jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]]), (b, 2, 3, 3)
        )
        intr_t = intr[:, :1]
        params = model.init(jax.random.PRNGKey(2), ctx, intr, tgt, intr_t)
        return model, params, ctx, intr, tgt, intr_t

    def test_forward_output_shapes(self):
        model, params, ctx, intr, tgt, intr_t = self._make()
        out = model.apply(params, ctx, intr, tgt, intr_t)
        b, vc, h, w = 1, 2, 32, 32
        g = vc * h * w
        assert out["gaussians"].means.shape == (b, g, 3)
        assert out["gaussians"].covariances.shape == (b, g, 3, 3)
        assert out["gaussians"].harmonics.shape == (b, g, 3, 4)
        assert out["gaussians"].opacities.shape == (b, g)
        assert out["extrinsics_c"].shape == (b, vc, 4, 4)
        assert out["extrinsics_cwt"].shape == (b, vc + 1, 4, 4)
        assert out["pts3d"].shape == (b, vc, h, w, 3)
        assert out["depths"].shape == (b, vc, h, w)
        for leaf in jax.tree.leaves(out):
            assert bool(jnp.isfinite(jnp.asarray(leaf)).all())

    def test_first_pose_is_identity(self):
        model, params, ctx, intr, tgt, intr_t = self._make()
        out = model.apply(params, ctx, intr, tgt, intr_t)
        np.testing.assert_allclose(
            out["extrinsics_cwt"][:, 0], jnp.broadcast_to(jnp.eye(4), (1, 4, 4)),
            atol=1e-5,
        )

    def test_opacities_in_range(self):
        model, params, ctx, intr, tgt, intr_t = self._make()
        out = model.apply(params, ctx, intr, tgt, intr_t)
        op = out["gaussians"].opacities
        assert float(op.min()) >= 0.0 and float(op.max()) <= 1.0
