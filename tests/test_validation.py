"""In-training validation step: metrics, comparison sheet, minifont.

Mirrors reference validation_step (src/model/model_wrapper.py:647-808).
"""

import jax
import numpy as np
import pytest

from spfsplatv2_tpu.models import get_encoder
from spfsplatv2_tpu.models.decoder import DecoderConfig

from tests.test_registry_wiring import tiny_batch, tiny_selector


class TestMinifont:
    def test_render_text_shape_and_range(self):
        from spfsplatv2_tpu.utils.minifont import render_text

        strip = render_text("Context Depth 01", width=128)
        assert strip.shape[1] == 128 and strip.shape[2] == 3
        assert strip.min() >= 0.0 and strip.max() <= 1.0
        # Some dark (ink) pixels must exist.
        assert (strip < 0.5).sum() > 20

    def test_width_crop(self):
        from spfsplatv2_tpu.utils.minifont import render_text

        assert render_text("WWWWWWWWWW", width=16).shape[1] == 16


class TestValidationStep:
    def test_metrics_and_artifacts(self, tmp_path):
        from spfsplatv2_tpu.training.validation import run_validation_step

        sel = tiny_selector("spfsplatv2")
        encoder = get_encoder(sel)
        batch = tiny_batch(b=1, v_cxt=2, v_tgt=1, h=32, w=32)
        params = encoder.init(
            jax.random.PRNGKey(0),
            batch["context"]["image"],
            batch["context"]["intrinsics"],
            batch["target"]["image"],
            batch["target"]["intrinsics"],
        )
        example = {
            side: {k: np.asarray(v[0]) for k, v in batch[side].items()}
            for side in ("context", "target")
        }
        metrics = run_validation_step(
            encoder, params, example, (32, 32),
            decoder_cfg=DecoderConfig(),
            out_dir=tmp_path, step=7, render_video=False,
        )
        for key in (
            "val/psnr", "val/ssim", "val/context/psnr",
            "val/target_angular_error", "val/context_transl_error",
        ):
            assert key in metrics and np.isfinite(metrics[key]), key
        sheet = tmp_path / "validation" / "step_7" / "comparison.png"
        assert sheet.exists() and sheet.stat().st_size > 1000

    def test_val_interval_wired_in_loop(self):
        """run_training reads trainer.val_check_interval (smoke: attribute
        path exists; full-loop validation is covered by the training drive)."""
        import inspect

        from spfsplatv2_tpu.training import loop

        src = inspect.getsource(loop.run_training)
        assert "val_check_interval" in src
        assert "run_validation_step" in src
