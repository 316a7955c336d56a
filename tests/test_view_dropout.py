"""Shape-stable random view dropout (SURVEY hard part #4).

The reference drops views by slicing the batch (model_wrapper.py:91-116),
which changes shapes and would recompile the 600M-param step per
(v_cxt, v_tgt) draw.  Our masks must (a) be numerically EQUIVALENT to
slicing for the kept views and (b) keep ONE compiled program across draws.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from spfsplatv2_tpu.models import EncoderSelectorConfig, get_encoder
from spfsplatv2_tpu.models.croco.backbone import CrocoBackboneConfig
from spfsplatv2_tpu.models.decoder import DecoderConfig
from spfsplatv2_tpu.models.encoder import SPFSplatV2Config
from spfsplatv2_tpu.training.optim import OptimizerConfig, make_optimizer
from spfsplatv2_tpu.training.step import (
    LossConfig,
    init_train_state,
    make_train_step,
)

TINY = SPFSplatV2Config(
    backbone=CrocoBackboneConfig(enc_depth=2, enc_embed_dim=64,
                                 enc_num_heads=4, dec_depth=2,
                                 dec_embed_dim=48, dec_num_heads=4),
    sh_degree=1, dpt_feature_dim=32, dpt_last_dim=16,
    dpt_layer_dims=(8, 16, 24, 32))


def make_enc():
    return get_encoder(EncoderSelectorConfig(name="spfsplatv2", spfsplatv2=TINY))


def batch_views(rng, b, v, h=32, w=32):
    return {
        "image": jnp.asarray(rng.uniform(0, 1, (b, v, h, w, 3)), jnp.float32),
        "intrinsics": jnp.broadcast_to(jnp.eye(3), (b, v, 3, 3)),
        "near": jnp.ones((b, v)),
        "far": jnp.full((b, v), 100.0),
        "extrinsics": jnp.broadcast_to(jnp.eye(4), (b, v, 4, 4)),
    }


class TestMaskEqualsSlicing:
    def test_masked_context_dropout_matches_sliced(self):
        rng = np.random.default_rng(0)
        enc = make_enc()
        ctx = batch_views(rng, 1, 3)
        tgt = batch_views(rng, 1, 1)
        params = enc.init(jax.random.PRNGKey(0), ctx["image"],
                          ctx["intrinsics"], tgt["image"], tgt["intrinsics"])

        # Masked: 3 context views with view 1 dropped.
        out_m = enc.apply(
            params, ctx["image"], ctx["intrinsics"], tgt["image"],
            tgt["intrinsics"],
            context_valid=jnp.asarray([1.0, 0.0, 1.0]),
        )
        # Sliced: the same two kept views.
        keep = [0, 2]
        out_s = enc.apply(
            params, ctx["image"][:, keep], ctx["intrinsics"][:, keep],
            tgt["image"], tgt["intrinsics"],
        )

        np.testing.assert_allclose(
            np.asarray(out_m["pts3d"][:, keep]),
            np.asarray(out_s["pts3d"]), rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out_m["extrinsics_cwt"][:, [0, 2, 3]]),
            np.asarray(out_s["extrinsics_cwt"]), rtol=2e-4, atol=2e-4,
        )
        # Dropped view's gaussians are transparent.
        hw = 32 * 32
        op_m = np.asarray(out_m["gaussians"].opacities).reshape(1, 3, hw)
        assert np.all(op_m[:, 1] == 0.0)
        assert np.all(op_m[:, 0] > 0.0)

    def test_single_compile_across_dropout_draws(self):
        rng = np.random.default_rng(1)
        enc = make_enc()
        ctx = batch_views(rng, 1, 4)
        tgt = batch_views(rng, 1, 2)
        params = enc.init(jax.random.PRNGKey(0), ctx["image"],
                          ctx["intrinsics"], tgt["image"], tgt["intrinsics"])
        opt = make_optimizer(OptimizerConfig(warm_up_steps=4), params)
        step = make_train_step(enc, opt, (32, 32), DecoderConfig(),
                               LossConfig(use_lpips=False), donate=False)
        state = init_train_state(enc, opt, params)

        masks = [
            ([1, 1, 1, 1], [1, 1]),
            ([1, 0, 0, 1], [1, 0]),
            ([1, 1, 0, 1], [0, 1]),
        ]
        totals = []
        for cv, tv in masks:
            batch = {
                "context": ctx, "target": tgt,
                "context_valid": jnp.asarray(cv, jnp.float32),
                "target_valid": jnp.asarray(tv, jnp.float32),
            }
            state, metrics = step(state, batch)
            totals.append(float(metrics["loss/total"]))
        # One TRACE across all dropout draws is the shape-stability claim;
        # tracing is what a new (v_cxt, v_tgt) shape would trigger.
        # (XLA compile counts can be distorted by the persistent
        # compilation cache's AOT-load fallbacks mid-suite.)
        assert len(step.trace_count) == 1, len(step.trace_count)
        assert all(np.isfinite(t) for t in totals)
