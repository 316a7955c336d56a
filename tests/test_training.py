import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from spfsplatv2_tpu.models.croco.backbone import CrocoBackboneConfig
from spfsplatv2_tpu.models.decoder import DecoderConfig
from spfsplatv2_tpu.models.encoder import SPFSplatV2Config, SPFSplatV2Encoder
from spfsplatv2_tpu.ops.rasterizer import RasterizerConfig
from spfsplatv2_tpu.training.optim import (
    OptimizerConfig,
    make_optimizer,
    skip_bad_gradients,
)
from spfsplatv2_tpu.training.step import (
    LossConfig,
    TrainState,
    init_train_state,
    make_train_step,
)

TINY = CrocoBackboneConfig(
    patch_size=16, enc_depth=2, enc_embed_dim=64, enc_num_heads=4,
    dec_depth=4, dec_embed_dim=48, dec_num_heads=4, compute_dtype="float32",
)
H = W = 32


def make_batch(key, b=2, v_cxt=2, v_tgt=1):
    keys = jax.random.split(key, 4)
    intr = jnp.broadcast_to(
        jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]]),
        (b, v_cxt + v_tgt, 3, 3),
    )
    eye = jnp.broadcast_to(jnp.eye(4), (b, v_cxt + v_tgt, 4, 4))
    return {
        "context": {
            "image": jax.random.uniform(keys[0], (b, v_cxt, H, W, 3)),
            "intrinsics": intr[:, :v_cxt],
            "near": jnp.full((b, v_cxt), 0.5),
            "far": jnp.full((b, v_cxt), 100.0),
            "extrinsics": eye[:, :v_cxt],
        },
        "target": {
            "image": jax.random.uniform(keys[1], (b, v_tgt, H, W, 3)),
            "intrinsics": intr[:, v_cxt:],
            "near": jnp.full((b, v_tgt), 0.5),
            "far": jnp.full((b, v_tgt), 100.0),
            "extrinsics": eye[:, v_cxt:],
        },
    }


@pytest.fixture(scope="module")
def harness():
    """One encoder + jitted train step shared by all tests in this module
    (compiles are the dominant cost on CPU)."""
    encoder = SPFSplatV2Encoder(SPFSplatV2Config(
        backbone=TINY, sh_degree=1,
        dpt_feature_dim=32, dpt_last_dim=16, dpt_layer_dims=(16, 24, 32, 48),
    ))
    batch = make_batch(jax.random.PRNGKey(0))
    # NOTE: do NOT jit the init — jit(init) compiles a graph whose XLA CPU
    # compile takes minutes, while eager init is ~50 s.
    params = encoder.init(
        jax.random.PRNGKey(1),
        batch["context"]["image"], batch["context"]["intrinsics"],
        batch["target"]["image"], batch["target"]["intrinsics"],
    )
    opt_cfg = OptimizerConfig(lr=2e-4, warm_up_steps=2, max_steps=100)
    optimizer = make_optimizer(opt_cfg, params)
    decoder_cfg = DecoderConfig(
        rasterizer=RasterizerConfig(max_per_tile=512, chunk=128)
    )
    step_fn = make_train_step(
        encoder, optimizer, (H, W), decoder_cfg,
        LossConfig(use_lpips=False),
        donate=False,
    )
    state = init_train_state(encoder, optimizer, params)
    return step_fn, state, batch


class TestOptimizer:
    def test_two_group_labels(self):
        from spfsplatv2_tpu.training.optim import _param_labels

        params = {
            "params": {
                "backbone": {"enc_blocks_0": {"w": jnp.ones(3)}},
                "pose_head1": {"fc_t": {"w": jnp.ones(3)}},
                "gaussian_param_head2": {"x": {"w": jnp.ones(3)}},
            }
        }
        labels = _param_labels(params)
        assert labels["params"]["backbone"]["enc_blocks_0"]["w"] == "pretrained"
        assert labels["params"]["pose_head1"]["fc_t"]["w"] == "new"
        assert labels["params"]["gaussian_param_head2"]["x"]["w"] == "new"

    def test_skip_nan_gradients(self):
        opt = skip_bad_gradients(optax.sgd(1.0), max_abs=5.0)
        params = {"w": jnp.ones(3)}
        state = opt.init(params)
        good = {"w": jnp.full(3, 0.1)}
        upd, state = opt.update(good, state, params)
        np.testing.assert_allclose(upd["w"], -0.1 * jnp.ones(3), atol=1e-6)
        bad = {"w": jnp.asarray([jnp.nan, 0.0, 0.0])}
        upd, state = opt.update(bad, state, params)
        np.testing.assert_allclose(upd["w"], jnp.zeros(3))
        assert int(state.skipped_count) == 1
        huge = {"w": jnp.asarray([100.0, 0.0, 0.0])}
        upd, state = opt.update(huge, state, params)
        np.testing.assert_allclose(upd["w"], jnp.zeros(3))
        assert int(state.skipped_count) == 2


class TestTrainStep:
    def test_loss_decreases(self, harness):
        step_fn, state, batch = harness
        first = None
        for i in range(6):
            state, metrics = step_fn(state, batch)
            assert bool(jnp.isfinite(metrics["loss/total"]))
            if first is None:
                first = float(metrics["loss/total"])
        assert float(metrics["loss/total"]) < first
        assert int(metrics["grad/skipped_steps"]) == 0
        assert int(state.step) == 6

    def test_metrics_present(self, harness):
        step_fn, state, batch = harness
        _, metrics = step_fn(state, batch)
        for key in [
            "loss/mse", "loss/total", "loss/reproj_c1", "loss/reproj_c2",
            "train/psnr", "pose/context_rot_deg", "grad/max",
            "raster/dropped_entries",
        ]:
            assert key in metrics, key

    def test_microbatch_matches_full_batch(self, harness):
        """Gradient accumulation == the full-batch step numerically.

        The reference trains b=16 on 80 GB A100s; one 16 GB v5e runs the
        same recipe as 4x4 accumulation (make_train_step(microbatch=...)),
        which must be the SAME optimizer step (equal chunks -> mean of
        means)."""
        step_full, state, _ = harness
        encoder = SPFSplatV2Encoder(SPFSplatV2Config(
            backbone=TINY, sh_degree=1,
            dpt_feature_dim=32, dpt_last_dim=16,
            dpt_layer_dims=(16, 24, 32, 48),
        ))
        optimizer = make_optimizer(
            OptimizerConfig(lr=2e-4, warm_up_steps=2, max_steps=100),
            state.params,
        )
        decoder_cfg = DecoderConfig(
            rasterizer=RasterizerConfig(max_per_tile=512, chunk=128)
        )
        step_micro = make_train_step(
            encoder, optimizer, (H, W), decoder_cfg,
            LossConfig(use_lpips=False), donate=False, microbatch=1,
        )
        batch = make_batch(jax.random.PRNGKey(9), b=2)
        s_full, m_full = step_full(state, batch)
        s_micro, m_micro = step_micro(state, batch)
        np.testing.assert_allclose(
            float(m_micro["loss/total"]), float(m_full["loss/total"]),
            rtol=2e-5,
        )
        diffs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            s_full.params, s_micro.params,
        )
        assert max(jax.tree.leaves(diffs)) < 5e-6, max(jax.tree.leaves(diffs))

    def test_lpips_loss_runs(self):
        from spfsplatv2_tpu.losses.lpips import init_lpips_params, lpips_loss

        lp = init_lpips_params()
        a = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
        b = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
        d_ab = float(lpips_loss(lp, a, b))
        d_aa = float(lpips_loss(lp, a, a))
        assert d_ab > d_aa >= 0.0


class TestDataParallel:
    def test_sharded_train_step_on_8_cpu_devices(self, harness):
        from spfsplatv2_tpu.parallel import make_mesh, replicate, shard_batch

        assert jax.device_count() >= 8
        mesh = make_mesh(n_data=8)
        step_fn, state, _ = harness
        batch = make_batch(jax.random.PRNGKey(7), b=8)
        state = replicate(state, mesh)
        batch = shard_batch(batch, mesh)
        state, metrics = step_fn(state, batch)
        assert bool(jnp.isfinite(metrics["loss/total"]))
        # Parameters must remain replicated after the update.
        leaf = jax.tree.leaves(state.params)[0]
        assert leaf.sharding.is_fully_replicated

    def test_dp_matches_single_device(self, harness):
        from spfsplatv2_tpu.parallel import make_mesh, replicate, shard_batch

        step_fn, state0, _ = harness
        batch = make_batch(jax.random.PRNGKey(3), b=8)

        _, m_single = step_fn(state0, batch)

        mesh = make_mesh(n_data=8)
        state_r = replicate(state0, mesh)
        _, m_dp = step_fn(state_r, shard_batch(batch, mesh))
        np.testing.assert_allclose(
            float(m_dp["loss/total"]), float(m_single["loss/total"]),
            rtol=2e-4,
        )


class TestKeywordFreezing:
    """Keyword parameter freezing (reference model_wrapper.py:83-85,
    178-184,1050-1065): frozen subtrees must receive exactly zero updates
    through a real train step, including weight decay."""

    def test_freeze_labels(self):
        from spfsplatv2_tpu.training.optim import FreezeConfig, _param_labels

        params = {
            "params": {
                "backbone": {"enc_blocks_0": {"w": jnp.ones(3)}},
                "pose_head1": {"fc_t": {"w": jnp.ones(3)}},
                "gaussian_param_head2": {"x": {"w": jnp.ones(3)}},
                "downstream_head1": {"y": {"w": jnp.ones(3)}},
            }
        }

        def flat(labels):
            p = labels["params"]
            return (p["backbone"]["enc_blocks_0"]["w"],
                    p["pose_head1"]["fc_t"]["w"],
                    p["gaussian_param_head2"]["x"]["w"],
                    p["downstream_head1"]["y"]["w"])

        lb = flat(_param_labels(params, FreezeConfig(freeze_backbone=True)))
        assert lb == ("frozen", "new", "new", "pretrained")
        # freeze_pretrained: trainable iff name matches an unfreeze keyword
        # (gaussian_param_head / pose_head / intrinsic_encoder).
        lp = flat(_param_labels(params, FreezeConfig(freeze_pretrained=True)))
        assert lp == ("frozen", "new", "new", "frozen")
        # pose_head freezing wins over the pretrained unfreeze list
        # (applied LAST in the reference).
        lph = flat(_param_labels(params, FreezeConfig(
            freeze_pretrained=True, freeze_pose_head=True)))
        assert lph == ("frozen", "frozen", "new", "frozen")

    def test_frozen_subtree_unchanged_through_real_step(self, harness):
        from spfsplatv2_tpu.training.optim import FreezeConfig

        _, state, batch = harness
        encoder = SPFSplatV2Encoder(SPFSplatV2Config(
            backbone=TINY, sh_degree=1,
            dpt_feature_dim=32, dpt_last_dim=16,
            dpt_layer_dims=(16, 24, 32, 48),
        ))
        opt_cfg = OptimizerConfig(lr=2e-4, warm_up_steps=2, max_steps=100)
        optimizer = make_optimizer(
            opt_cfg, state.params, freeze=FreezeConfig(freeze_pose_head=True)
        )
        step_fn = make_train_step(
            encoder, optimizer, (H, W),
            DecoderConfig(rasterizer=RasterizerConfig(max_per_tile=512,
                                                      chunk=128)),
            LossConfig(use_lpips=False), donate=False,
        )
        state_f = init_train_state(encoder, optimizer, state.params)
        new_state, metrics = step_fn(state_f, batch)
        assert np.isfinite(float(metrics["loss/total"]))

        def subtree(params, key_part):
            return {
                k: v for k, v in params["params"].items() if key_part in k
            }

        before_pose = subtree(state_f.params, "pose_head")
        after_pose = subtree(new_state.params, "pose_head")
        assert len(jax.tree.leaves(before_pose)) > 0
        for b_leaf, a_leaf in zip(
            jax.tree.leaves(before_pose), jax.tree.leaves(after_pose)
        ):
            np.testing.assert_array_equal(np.asarray(b_leaf), np.asarray(a_leaf))
        # ... while unfrozen params did move.
        before_bb = subtree(state_f.params, "downstream_head")
        after_bb = subtree(new_state.params, "downstream_head")
        diffs = [
            float(jnp.abs(a - b).max())
            for a, b in zip(jax.tree.leaves(before_bb), jax.tree.leaves(after_bb))
        ]
        assert max(diffs) > 0.0
