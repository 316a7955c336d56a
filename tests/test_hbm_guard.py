"""HBM-fit guard: over-budget steps auto-halve microbatch or fail loudly.

Round-4 lesson (PERFORMANCE.md): a train step whose compile SUCCEEDS can
still exceed device HBM — the runtime silently pages host<->device at
~10x step cost with no warning.  run_training now AOT-compiles the step,
reads XLA's memory_analysis, and halves the accumulation microbatch
until the step fits (raising HBMBudgetError when it can't).
"""

import numpy as np
import pytest

from tests.test_registry_wiring import TINY_BB, TINY_HEADS


def _tiny_cfg(root, batch_size, budget_gb, microbatch=0):
    from spfsplatv2_tpu.config import load_config

    ov = [
        "mode=train",
        f"dataset.roots=['{root}']",
        "dataset.original_image_shape=[32,32]",
        "dataset.input_image_shape=[32,32]",
        "image_shape=[32,32]",
        f"trainer.batch_size={batch_size}",
        f"trainer.hbm_budget_gb={budget_gb}",
        f"trainer.microbatch={microbatch}",
        "trainer.max_steps=1",
        "trainer.val_check_interval=0",
        "checkpointing.every_n_train_steps=0",
        "loss.use_lpips=false",
        "encoder.spfsplatv2.sh_degree=1",
        # 12-frame synthetic scenes: the default bounded-sampler gaps
        # (min 25 frames) would skip EVERY scene and spin forever.
        "view_sampler.min_distance_between_context_views=2",
        "view_sampler.max_distance_between_context_views=6",
        "view_sampler.initial_min_distance_between_context_views=2",
        "view_sampler.initial_max_distance_between_context_views=6",
        "view_sampler.warm_up_steps=0",
    ]
    for k, v in TINY_BB.items():
        ov.append(f"encoder.spfsplatv2.backbone.{k}={v}")
    for k, v in TINY_HEADS.items():
        if k == "sh_degree":
            continue
        vv = list(v) if isinstance(v, tuple) else v
        ov.append(f"encoder.spfsplatv2.{k}={vv}")
    return load_config(None, ov)


@pytest.fixture(scope="module")
def train_root(tmp_path_factory):
    from spfsplatv2_tpu.data.synthetic import write_synthetic_dataset

    root = tmp_path_factory.mktemp("ds")
    write_synthetic_dataset(
        root, num_scenes=2, num_frames=12, image_hw=(32, 32), stage="train"
    )
    return root


class TestHBMGuard:
    def test_generous_budget_trains_and_logs_peak(self, train_root, capsys):
        from spfsplatv2_tpu.training.loop import run_training

        cfg = _tiny_cfg(train_root, batch_size=8, budget_gb=1e6)
        logged = {}
        result = run_training(
            cfg, max_steps=1, log_fn=lambda s, m: logged.update(m)
        )
        assert np.isfinite(result["metrics"]["loss/total"])
        # Peak HBM is surfaced both on stdout and in the metrics stream.
        assert "train step peak HBM" in capsys.readouterr().out
        assert logged.get("mem/peak_hbm_gb", 0) > 0

    def test_tiny_budget_halves_then_raises(self, train_root, capsys,
                                            monkeypatch):
        """The halving loop is exercised with a stubbed compile (real
        AOT compiles of every halved variant would cost minutes on CPU);
        the guard's peak measurement itself is covered by
        test_generous_budget_trains_and_logs_peak."""
        from spfsplatv2_tpu.training import loop as loop_mod
        from spfsplatv2_tpu.training.loop import run_training
        from spfsplatv2_tpu.training.step import HBMBudgetError

        compiled_microbatches = []

        class StubStep:
            def __init__(self, microbatch):
                self.microbatch = microbatch

            def compile_checked(self, state, batch):
                compiled_microbatches.append(self.microbatch)
                return (lambda s, b: (s, {})), 99.0  # always over budget

        def stub_make_train_step(*args, microbatch=None, **kwargs):
            return StubStep(microbatch)

        monkeypatch.setattr(loop_mod, "make_train_step",
                            stub_make_train_step)
        cfg = _tiny_cfg(train_root, batch_size=8, budget_gb=1e-6)
        with pytest.raises(HBMBudgetError, match="cannot halve further"):
            run_training(cfg, max_steps=1)
        # The guard tried the full batch, then halved 4 -> 2 -> 1.
        assert compiled_microbatches == [None, 4, 2, 1]
        out = capsys.readouterr().out
        assert "halving accumulation microbatch 8 -> 4" in out
        assert "halving accumulation microbatch 2 -> 1" in out

    def test_peak_hbm_helpers(self):
        import jax
        import jax.numpy as jnp

        from spfsplatv2_tpu.training.step import peak_hbm_gb

        f = jax.jit(lambda x: (x @ x).sum())
        compiled = f.lower(jnp.ones((128, 128))).compile()
        peak = peak_hbm_gb(compiled)
        assert peak is not None and peak > 0
