"""ManyAR mixed portrait/landscape patch embed.

Reference: ManyAR_PatchEmbed, src/model/encoder/backbone/croco/patch_embed.py:33-71.
"""

import jax
import jax.numpy as jnp
import numpy as np

from spfsplatv2_tpu.models.croco.layers import ManyARPatchEmbed, PatchEmbed


def _init_pair(h=32, w=48, p=16, dim=64):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, h, w, 3)), jnp.float32)
    many = ManyARPatchEmbed(p, dim, jnp.float32)
    plain = PatchEmbed(p, dim, jnp.float32)
    shapes = jnp.asarray([[h, w], [h, w]], jnp.int32)
    params = many.init(jax.random.PRNGKey(0), img, shapes)
    return img, many, plain, params, (h, w, p, dim)


class TestManyAR:
    def test_landscape_matches_plain_embed(self):
        img, many, plain, params, (h, w, p, dim) = _init_pair()
        shapes = jnp.asarray([[h, w], [h, w]], jnp.int32)
        x_many, pos_many = many.apply(params, img, shapes)
        x_plain, pos_plain = plain.apply(params, img)
        np.testing.assert_allclose(
            np.asarray(x_many), np.asarray(x_plain), atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(pos_many), np.asarray(pos_plain))

    def test_portrait_equals_plain_on_transposed_buffer(self):
        img, many, plain, params, (h, w, p, dim) = _init_pair()
        # Mark image 1 as portrait (true h > true w): its tokens must equal
        # the plain embed of the TRANSPOSED buffer, with transposed grid pos.
        shapes = jnp.asarray([[h, w], [w, h]], jnp.int32)
        x_many, pos_many = many.apply(params, img, shapes)
        x_t, pos_t = plain.apply(params, jnp.swapaxes(img, 1, 2))
        np.testing.assert_allclose(
            np.asarray(x_many[1]), np.asarray(x_t[1]), atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(pos_many[1]), np.asarray(pos_t[1]))
        # Image 0 stays landscape.
        x_plain, pos_plain = plain.apply(params, img)
        np.testing.assert_allclose(
            np.asarray(x_many[0]), np.asarray(x_plain[0]), atol=1e-6
        )

    def test_one_compile_for_any_mix(self):
        """Static shapes: every portrait/landscape mix shares one program."""
        img, many, plain, params, (h, w, p, dim) = _init_pair()

        @jax.jit
        def run(shapes):
            return many.apply(params, img, shapes)

        run(jnp.asarray([[h, w], [h, w]], jnp.int32))
        run(jnp.asarray([[w, h], [h, w]], jnp.int32))
        run(jnp.asarray([[w, h], [w, h]], jnp.int32))
        assert run._cache_size() == 1

    def test_backbone_accepts_manyar(self):
        import dataclasses

        from spfsplatv2_tpu.models.croco.backbone import (
            CrocoBackboneConfig,
            MaskedCrocoBackbone,
        )

        cfg = CrocoBackboneConfig(
            enc_depth=1, enc_embed_dim=64, enc_num_heads=4, dec_depth=1,
            dec_embed_dim=48, dec_num_heads=4, patch_embed_cls="manyar",
            intrinsics_token=False, compute_dtype="float32",
        )
        bb = MaskedCrocoBackbone(cfg)
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.normal(size=(1, 2, 32, 48, 3)), jnp.float32)
        shapes = jnp.asarray([[[32, 48], [48, 32]]], jnp.int32)
        params = bb.init(jax.random.PRNGKey(0), img, num_target=1,
                         true_shapes=shapes)
        out = bb.apply(params, img, num_target=1, true_shapes=shapes)
        assert out["dec_feat"][-1].shape[:3] == (1, 2, (32 // 16) * (48 // 16))
