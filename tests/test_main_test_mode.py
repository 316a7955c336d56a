"""End-to-end `mode=test` CLI: evaluation sampler + registry + artifacts.

Drives spfsplatv2_tpu.main through the public config path on a synthetic
fixed-index dataset and checks the reference artifact set appears
(reference: src/model/model_wrapper.py:594-645 scores_all/sub_avg/benchmark).
"""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from tests.test_registry_wiring import TINY_BB, TINY_HEADS


@pytest.fixture(scope="module")
def test_root(tmp_path_factory):
    from spfsplatv2_tpu.data.synthetic import write_synthetic_dataset

    root = tmp_path_factory.mktemp("ds")
    write_synthetic_dataset(
        root, num_scenes=2, num_frames=12, image_hw=(32, 32), stage="test"
    )
    return root


def _tiny_overrides(root, index_path, ckpt, out_dir):
    ov = [
        "mode=test",
        f"dataset.roots=['{root}']",
        "dataset.original_image_shape=[32,32]",
        "dataset.input_image_shape=[32,32]",
        "view_sampler_name=evaluation",
        f"evaluation_sampler.index_path={index_path}",
        f"checkpointing.load={ckpt}",
        f"test.output_path={out_dir}",
        "test.save_video=false",
        "loss.use_lpips=false",
        "image_shape=[32,32]",
        "encoder.spfsplatv2.sh_degree=1",
    ]
    for k, v in TINY_BB.items():
        ov.append(f"encoder.spfsplatv2.backbone.{k}={v}")
    for k, v in TINY_HEADS.items():
        if k == "sh_degree":
            continue
        vv = list(v) if isinstance(v, tuple) else v
        ov.append(f"encoder.spfsplatv2.{k}={vv}")
    return ov


class TestMainTestMode:
    def test_artifact_set(self, test_root, tmp_path):
        from spfsplatv2_tpu.config import load_config
        from spfsplatv2_tpu.main import main
        from spfsplatv2_tpu.models import get_encoder
        from spfsplatv2_tpu.training.loop import save_checkpoint

        index = {
            "scene_000": {"context": [0, 6], "target": [3], "overlap": 0.2},
            "scene_001": {"context": [2, 8], "target": [5], "overlap": 0.5},
        }
        index_path = tmp_path / "evaluation_index.json"
        index_path.write_text(json.dumps(index))
        out_dir = tmp_path / "test_out"

        # Save a checkpoint of random params for the tiny encoder config.
        ov = _tiny_overrides(test_root, index_path, "UNSET", out_dir)
        cfg = load_config(None, [o for o in ov if not o.startswith("checkpointing")])
        encoder = get_encoder(cfg.encoder)
        rng = np.random.default_rng(0)
        img = np.asarray(rng.uniform(0, 1, (1, 2, 32, 32, 3)), np.float32)
        intr = np.broadcast_to(np.eye(3, dtype=np.float32), (1, 2, 3, 3))
        timg = img[:, :1]
        tintr = intr[:, :1]
        params = encoder.init(jax.random.PRNGKey(0), img, intr, timg, tintr)
        ckpt_dir = tmp_path / "ckpt"
        save_checkpoint(ckpt_dir, {"params": jax.device_get(params)}, 0)

        rc = main(
            _tiny_overrides(test_root, index_path, ckpt_dir / "step_0", out_dir)
        )
        assert rc == 0
        for name in (
            "scores_all.json", "scores_all_avg.json", "scores_sub_avg.json",
            "benchmark.json", "peak_memory.json",
        ):
            assert (out_dir / name).exists(), name

        scores = json.loads((out_dir / "scores_all.json").read_text())
        assert len(scores) == 2
        assert all("psnr" in s and "pose_rot_err_deg" in s for s in scores)
        # Per-overlap buckets: 0.2 -> small, 0.5 -> medium.
        sub = json.loads((out_dir / "scores_sub_avg.json").read_text())
        assert set(sub) == {"small", "medium"}
        assert all(v["num_scenes"] == 1 for v in sub.values())

    def test_uncalibrated_lpips_is_labeled(self, test_root, tmp_path):
        """Without converted VGG weights the metric key must switch to
        `lpips_uncalibrated` in every dumped JSON (random-VGG scores are
        not comparable to published LPIPS numbers)."""
        from spfsplatv2_tpu.config import load_config
        from spfsplatv2_tpu.main import main
        from spfsplatv2_tpu.models import get_encoder
        from spfsplatv2_tpu.training.loop import save_checkpoint

        index = {
            "scene_000": {"context": [0, 6], "target": [3], "overlap": 0.2},
        }
        index_path = tmp_path / "evaluation_index.json"
        index_path.write_text(json.dumps(index))
        out_dir = tmp_path / "test_out_lpips"

        ov = _tiny_overrides(test_root, index_path, "UNSET", out_dir)
        ov = [o for o in ov if o != "loss.use_lpips=false"]
        ov.append("loss.use_lpips=true")
        cfg = load_config(
            None, [o for o in ov if not o.startswith("checkpointing")]
        )
        encoder = get_encoder(cfg.encoder)
        rng = np.random.default_rng(0)
        img = np.asarray(rng.uniform(0, 1, (1, 2, 32, 32, 3)), np.float32)
        intr = np.broadcast_to(np.eye(3, dtype=np.float32), (1, 2, 3, 3))
        params = encoder.init(
            jax.random.PRNGKey(0), img, intr, img[:, :1], intr[:, :1]
        )
        ckpt_dir = tmp_path / "ckpt_lpips"
        save_checkpoint(ckpt_dir, {"params": jax.device_get(params)}, 0)

        rc = main(ov[:1] + [f"checkpointing.load={ckpt_dir / 'step_0'}"]
                  + [o for o in ov[1:] if not o.startswith("checkpointing")])
        assert rc == 0
        scores = json.loads((out_dir / "scores_all.json").read_text())
        assert all("lpips_uncalibrated" in s and "lpips" not in s
                   for s in scores)
        avg = json.loads((out_dir / "scores_all_avg.json").read_text())
        assert avg["lpips_uncalibrated"] is not None
        assert avg["lpips"] is None


class TestMainEvalPoseMode:
    def test_pose_eval_artifact(self, test_root, tmp_path):
        """mode=eval_pose (the reference's `python -m src.eval_pose`):
        feed-forward + PnP pose errors over the test split."""
        from spfsplatv2_tpu.config import load_config
        from spfsplatv2_tpu.main import main
        from spfsplatv2_tpu.models import get_encoder
        from spfsplatv2_tpu.training.loop import save_checkpoint

        index = {
            "scene_000": {"context": [0, 6], "target": [3], "overlap": 0.2},
            "scene_001": {"context": [2, 8], "target": [5], "overlap": 0.5},
        }
        index_path = tmp_path / "evaluation_index.json"
        index_path.write_text(json.dumps(index))
        out_dir = tmp_path / "pose_out"

        ov = _tiny_overrides(test_root, index_path, "UNSET", out_dir)
        cfg = load_config(
            None, [o for o in ov if not o.startswith("checkpointing")]
        )
        encoder = get_encoder(cfg.encoder)
        rng = np.random.default_rng(0)
        img = np.asarray(rng.uniform(0, 1, (1, 2, 32, 32, 3)), np.float32)
        intr = np.broadcast_to(np.eye(3, dtype=np.float32), (1, 2, 3, 3))
        params = encoder.init(
            jax.random.PRNGKey(0), img, intr, img[:, :1], intr[:, :1]
        )
        ckpt_dir = tmp_path / "ckpt_pose"
        save_checkpoint(ckpt_dir, {"params": jax.device_get(params)}, 0)

        ov = [
            o if o != "mode=test" else "mode=eval_pose"
            for o in _tiny_overrides(
                test_root, index_path, ckpt_dir / "step_0", out_dir
            )
        ]
        rc = main(ov)
        assert rc == 0
        summary = json.loads((out_dir / "pose_eval.json").read_text())
        assert "feed_forward" in summary and "pnp" in summary
        assert np.isfinite(summary["feed_forward"]["pose_median_deg"])


class TestRunningMetricTables:
    """Running console tables during the test loop (reference
    print_preview_metrics, model_wrapper.py:987-1046)."""

    def test_running_means_and_buckets(self):
        from spfsplatv2_tpu.evaluation.evaluator import RunningMetricTables

        t = RunningMetricTables()
        t.update({"psnr": [20.0, 22.0], "ssim": [0.8], "overlap_tag": "small"})
        t.update({"psnr": [25.0], "ssim": [0.9], "overlap_tag": "medium"})
        t.update({"psnr": [27.0], "overlap_tag": "small"})
        m = t.means()
        # per-scene means first: (21 + 25 + 27) / 3
        np.testing.assert_allclose(m["psnr"], (21.0 + 25.0 + 27.0) / 3)
        np.testing.assert_allclose(m["ssim"], (0.8 + 0.9) / 2)
        np.testing.assert_allclose(t.means("small")["psnr"], 24.0)
        np.testing.assert_allclose(t.means("medium")["psnr"], 25.0)
        out = t.render()
        assert "All Pairs:" in out and "Overlap: small" in out
        assert "psnr" in out

    def test_render_empty(self):
        from spfsplatv2_tpu.evaluation.evaluator import RunningMetricTables

        assert "no metrics" in RunningMetricTables().render()
