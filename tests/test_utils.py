import json

import numpy as np
import pytest

from spfsplatv2_tpu.config import RootConfig, load_config
from spfsplatv2_tpu.utils.ply_export import export_ply, load_ply
from spfsplatv2_tpu.utils.visualization import (
    apply_depth_colormap,
    hcat,
    interpolate_extrinsics,
    vcat,
)


class TestConfig:
    def test_defaults(self):
        cfg = load_config()
        assert cfg.mode == "train"
        assert cfg.encoder.name == "spfsplatv2"
        assert cfg.encoder.variant_cfg.backbone.enc_depth == 24
        assert cfg.optimizer.lr == 1e-4
        assert cfg.image_shape == (256, 256)

    def test_yaml_overlay_and_overrides(self, tmp_path):
        p = tmp_path / "exp.yaml"
        p.write_text(
            "optimizer:\n  lr: 0.0002\ntrainer:\n  batch_size: 4\n"
            "dataset:\n  roots: [/data/re10k]\n"
        )
        cfg = load_config(
            [p], ["mode=test", "encoder.spfsplatv2.sh_degree=2", "trainer.max_steps=100"]
        )
        assert cfg.optimizer.lr == pytest.approx(2e-4)
        assert cfg.trainer.batch_size == 4
        assert cfg.dataset.roots == ("/data/re10k",)
        assert cfg.mode == "test"
        assert cfg.encoder.spfsplatv2.sh_degree == 2
        assert cfg.trainer.max_steps == 100

    def test_unknown_key_rejected(self):
        with pytest.raises(KeyError):
            load_config(None, ["optimizer.bogus_key=1"])

    def test_nested_dataclasses_typed(self):
        cfg = load_config(None, ["encoder.spfsplatv2.backbone.enc_depth=2"])
        assert cfg.encoder.spfsplatv2.backbone.enc_depth == 2
        assert isinstance(cfg.encoder.spfsplatv2.backbone.enc_depth, int)


class TestPly:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        g = 50
        means = rng.normal(size=(g, 3)).astype(np.float32)
        scales = rng.uniform(0.01, 0.1, (g, 3)).astype(np.float32)
        quats = rng.normal(size=(g, 4)).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
        harm = rng.normal(size=(g, 3, 25)).astype(np.float32)
        op = rng.uniform(0.1, 0.9, (g,)).astype(np.float32)

        path = tmp_path / "test.ply"
        export_ply(means, scales, quats, harm, op, path)
        loaded = load_ply(path)
        assert loaded["means"].shape == (g, 3)
        np.testing.assert_allclose(loaded["opacities"], op, atol=1e-4)
        np.testing.assert_allclose(loaded["harmonics_dc"], harm[:, :, 0], atol=1e-5)
        # Normalization: 95th percentile radius ~1
        radii = np.linalg.norm(loaded["means"], axis=-1)
        assert 0.8 < np.quantile(radii, 0.95) < 1.2


class TestVisualization:
    def test_hcat_vcat(self):
        a = np.zeros((10, 5, 3))
        b = np.ones((8, 7, 3))
        out = hcat(a, b, border=2)
        assert out.shape == (10, 14, 3)
        out2 = vcat(a, np.ones((4, 5, 3)), border=2)
        assert out2.shape == (16, 5, 3)

    def test_depth_colormap(self):
        d = np.linspace(1, 10, 64).reshape(8, 8)
        c = apply_depth_colormap(d, near=1.0, far=10.0)
        assert c.shape == (8, 8, 3)
        assert c.min() >= 0 and c.max() <= 1
        assert np.abs(c[0, 0] - c[-1, -1]).max() > 0.2  # near != far colors

    def test_interpolate_extrinsics_endpoints(self):
        import jax.numpy as jnp

        from spfsplatv2_tpu.geometry import se3

        a = np.eye(4, dtype=np.float32)
        theta = np.asarray([0.0, 0.3, 0.0])
        b = np.asarray(
            se3.pack_rt(se3.so3_exp(jnp.asarray(theta)), jnp.asarray([1.0, 0, 0]))
        )
        path = interpolate_extrinsics(a, b, np.asarray([0.0, 0.5, 1.0]))
        np.testing.assert_allclose(path[0], a, atol=1e-5)
        np.testing.assert_allclose(path[2], b, atol=1e-5)
        # Midpoint translation is halfway.
        np.testing.assert_allclose(path[1][:3, 3], [0.5, 0, 0], atol=1e-5)


class TestEvaluationMetrics:
    def test_psnr_identity(self):
        import jax.numpy as jnp

        from spfsplatv2_tpu.evaluation.metrics import compute_psnr

        img = jnp.ones((2, 8, 8, 3)) * 0.5
        assert float(compute_psnr(img, img)[0]) > 100

    def test_pose_auc_summary(self):
        from spfsplatv2_tpu.evaluation.metrics import pose_auc_summary

        rot = np.asarray([1.0, 2.0, 30.0])
        tr = np.asarray([0.5, 1.0, 50.0])
        s = pose_auc_summary(rot, tr)
        assert 0 < s["rotation_auc"]["@5deg"] <= 1
        assert s["pose_median_deg"] == pytest.approx(2.0)

    def test_ssim_sensible(self):
        import jax.numpy as jnp

        from spfsplatv2_tpu.evaluation.metrics import compute_ssim

        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        same = float(compute_ssim(a, a)[0])
        diff = float(compute_ssim(a, 1 - a)[0])
        assert same > 0.99
        assert diff < 0.5


class TestWandbCheckpointURI:
    def test_plain_path_passes_through(self, tmp_path):
        from spfsplatv2_tpu.training.loop import resolve_checkpoint_uri

        assert resolve_checkpoint_uri(tmp_path) == tmp_path

    def test_wandb_uri_requires_wandb(self, monkeypatch):
        # Reference checkpoint URIs (src/misc/wandb_tools.py:43-62).
        import builtins

        from spfsplatv2_tpu.training.loop import resolve_checkpoint_uri

        real_import = builtins.__import__

        def block_wandb(name, *a, **k):
            if name == "wandb":
                raise ImportError("no wandb in test env")
            return real_import(name, *a, **k)

        monkeypatch.setattr(builtins, "__import__", block_wandb)
        import pytest

        with pytest.raises(RuntimeError, match="wandb"):
            resolve_checkpoint_uri("wandb://abc123:v3")
