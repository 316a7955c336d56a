"""Wiring tests for round-2 components: encoder registry through the public
config path, v1 loss branch, distiller step, focal estimation, resume.

Mirrors reference surfaces:
  * registry: src/model/encoder/__init__.py:9-22
  * v1 extra reproj term: src/model/model_wrapper.py:284-304
  * distillation: src/model/model_wrapper.py:322-331
  * focal: src/model/model_wrapper.py:402-407
  * resume: src/main.py:71-90
"""

import dataclasses
import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spfsplatv2_tpu.config import load_config
from spfsplatv2_tpu.models import EncoderSelectorConfig, get_encoder
from spfsplatv2_tpu.models.croco.backbone import CrocoBackboneConfig
from spfsplatv2_tpu.models.croco.backbone_multi import CrocoMultiBackboneConfig
from spfsplatv2_tpu.models.decoder import DecoderConfig
from spfsplatv2_tpu.models.encoder import SPFSplatV2Config
from spfsplatv2_tpu.models.encoder_spfsplat import SPFSplatConfig
from spfsplatv2_tpu.training.optim import OptimizerConfig, make_optimizer
from spfsplatv2_tpu.training.step import (
    LossConfig,
    init_train_state,
    make_train_step,
)

TINY_BB = dict(enc_depth=2, enc_embed_dim=64, enc_num_heads=4,
               dec_depth=2, dec_embed_dim=48, dec_num_heads=4)
TINY_HEADS = dict(sh_degree=1, dpt_feature_dim=32, dpt_last_dim=16,
                  dpt_layer_dims=(8, 16, 24, 32))


def tiny_selector(name: str) -> EncoderSelectorConfig:
    return EncoderSelectorConfig(
        name=name,
        spfsplat=SPFSplatConfig(
            backbone=CrocoMultiBackboneConfig(**TINY_BB), **TINY_HEADS
        ),
        spfsplatv2=SPFSplatV2Config(
            backbone=CrocoBackboneConfig(**TINY_BB), **TINY_HEADS
        ),
    )


def tiny_batch(b=1, v_cxt=2, v_tgt=1, h=32, w=32, seed=0):
    rng = np.random.default_rng(seed)

    def views(v):
        return {
            "image": jnp.asarray(rng.uniform(0, 1, (b, v, h, w, 3)),
                                 jnp.float32),
            "intrinsics": jnp.broadcast_to(jnp.eye(3), (b, v, 3, 3)),
            "near": jnp.ones((b, v)),
            "far": jnp.full((b, v), 100.0),
            "extrinsics": jnp.broadcast_to(jnp.eye(4), (b, v, 4, 4)),
        }

    return {"context": views(v_cxt), "target": views(v_tgt)}


class TestRegistry:
    def test_config_selects_variants(self):
        cfg = load_config(overrides=["encoder.name=spfsplat"])
        assert cfg.encoder.name == "spfsplat"
        assert type(cfg.encoder.variant_cfg).__name__ == "SPFSplatConfig"
        cfg = load_config(overrides=["encoder.name=spfsplatv2l"])
        assert type(cfg.encoder.variant_cfg).__name__ == "SPFSplatV2LConfig"

    def test_unknown_name_raises(self):
        sel = EncoderSelectorConfig(name="nope")
        with pytest.raises(KeyError):
            get_encoder(sel)

    def test_all_variants_instantiate(self):
        for name in ("spfsplat", "spfsplatv2"):
            enc = get_encoder(tiny_selector(name))
            assert enc is not None


class TestV1Family:
    def test_forward_shapes_and_two_pose_sets(self):
        enc = get_encoder(tiny_selector("spfsplat"))
        batch = tiny_batch()
        ctx, tgt = batch["context"], batch["target"]
        params = enc.init(jax.random.PRNGKey(0), ctx["image"],
                          ctx["intrinsics"], tgt["image"], tgt["intrinsics"])
        out = enc.apply(params, ctx["image"], ctx["intrinsics"],
                        tgt["image"], tgt["intrinsics"])
        assert out["variant"] == "spfsplat"
        assert out["extrinsics_c"].shape == (1, 2, 4, 4)
        assert out["extrinsics_cwt"].shape == (1, 3, 4, 4)
        # context-only pass and with-target pass produce DIFFERENT context
        # poses in general (different attention sets)
        assert np.isfinite(np.asarray(out["extrinsics_cwt"])).all()

    def test_v1_train_step_has_extra_reproj_term(self):
        enc = get_encoder(tiny_selector("spfsplat"))
        batch = tiny_batch()
        ctx, tgt = batch["context"], batch["target"]
        params = enc.init(jax.random.PRNGKey(0), ctx["image"],
                          ctx["intrinsics"], tgt["image"], tgt["intrinsics"])
        opt = make_optimizer(OptimizerConfig(warm_up_steps=4), params)
        step = make_train_step(enc, opt, (32, 32), DecoderConfig(),
                               LossConfig(use_lpips=False), donate=False)
        state = init_train_state(enc, opt, params)
        _, metrics = step(state, batch)
        assert "loss/reproj_c2_only" in metrics
        assert np.isfinite(float(metrics["loss/total"]))

    def test_v2_step_has_no_extra_term(self):
        enc = get_encoder(tiny_selector("spfsplatv2"))
        batch = tiny_batch()
        ctx, tgt = batch["context"], batch["target"]
        params = enc.init(jax.random.PRNGKey(0), ctx["image"],
                          ctx["intrinsics"], tgt["image"], tgt["intrinsics"])
        opt = make_optimizer(OptimizerConfig(warm_up_steps=4), params)
        step = make_train_step(enc, opt, (32, 32), DecoderConfig(),
                               LossConfig(use_lpips=False), donate=False)
        state = init_train_state(enc, opt, params)
        _, metrics = step(state, batch)
        assert "loss/reproj_c2_only" not in metrics
        assert "loss/reproj_c1" in metrics


class TestDistillerWiring:
    def test_distiller_term_in_step(self):
        from spfsplatv2_tpu.models.distiller import (
            DistillerConfig,
            Dust3RDistiller,
        )

        enc = get_encoder(tiny_selector("spfsplatv2"))
        batch = tiny_batch(seed=3)
        ctx, tgt = batch["context"], batch["target"]
        params = enc.init(jax.random.PRNGKey(0), ctx["image"],
                          ctx["intrinsics"], tgt["image"], tgt["intrinsics"])
        dist = Dust3RDistiller(DistillerConfig(
            backbone=CrocoBackboneConfig(
                enc_depth=1, enc_embed_dim=64, enc_num_heads=4, dec_depth=1,
                dec_embed_dim=48, dec_num_heads=4,
                intrinsics_token=False, pose_token=False)))
        dparams = dist.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 2, 32, 32, 3)))
        opt = make_optimizer(OptimizerConfig(warm_up_steps=4), params)
        step = make_train_step(enc, opt, (32, 32), DecoderConfig(),
                               LossConfig(use_lpips=False), donate=False,
                               distiller=dist, distiller_params=dparams)
        state = init_train_state(enc, opt, params)
        _, metrics = step(state, batch)
        assert "loss/distillation" in metrics
        assert np.isfinite(float(metrics["loss/distillation"]))

    def test_distiller_grads_do_not_touch_teacher(self):
        # teacher params are closed over, not part of TrainState -> nothing
        # to assert beyond the step running; presence checked above
        pass


class TestFocalWiring:
    def test_encoder_reports_estimated_intrinsics(self):
        sel = tiny_selector("spfsplatv2")
        sel = dataclasses.replace(
            sel,
            spfsplatv2=dataclasses.replace(sel.spfsplatv2,
                                           estimating_focal=True),
        )
        enc = get_encoder(sel)
        batch = tiny_batch(seed=5)
        ctx, tgt = batch["context"], batch["target"]
        params = enc.init(jax.random.PRNGKey(0), ctx["image"],
                          ctx["intrinsics"], tgt["image"], tgt["intrinsics"])
        out = enc.apply(params, ctx["image"], ctx["intrinsics"],
                        tgt["image"], tgt["intrinsics"])
        assert out["intrinsics_cwt"].shape == (1, 3, 3, 3)
        k = np.asarray(out["intrinsics_cwt"])
        assert np.isfinite(k).all()
        assert (k[..., 0, 0] > 0).all()


class TestResume:
    def test_restore_latest_checkpoint(self):
        from spfsplatv2_tpu.training.loop import (
            restore_latest_checkpoint,
            save_checkpoint,
        )

        enc = get_encoder(tiny_selector("spfsplatv2"))
        batch = tiny_batch()
        ctx, tgt = batch["context"], batch["target"]
        params = enc.init(jax.random.PRNGKey(0), ctx["image"],
                          ctx["intrinsics"], tgt["image"], tgt["intrinsics"])
        opt = make_optimizer(OptimizerConfig(warm_up_steps=4), params)
        state = init_train_state(enc, opt, params)
        state = dataclasses.replace(state, step=jnp.asarray(41))
        with tempfile.TemporaryDirectory() as td:
            save_checkpoint(Path(td), state, 3)
            save_checkpoint(Path(td), state, 41)
            restored = restore_latest_checkpoint(Path(td), state)
            assert restored is not None
            rstate, rstep = restored
            assert rstep == 41
            a = jax.tree.leaves(rstate.params)[0]
            b = jax.tree.leaves(state.params)[0]
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_no_checkpoint_returns_none(self):
        from spfsplatv2_tpu.training.loop import restore_latest_checkpoint

        with tempfile.TemporaryDirectory() as td:
            assert restore_latest_checkpoint(Path(td) / "nope", None) is None
