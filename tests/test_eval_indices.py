"""Shipped frozen evaluation indices drive the reference test protocol.

The reference's NVS parity protocol runs over fixed (context, target)
frame indices shipped as data tables (reference:
assets/evaluation_index_*.json, consumed by
src/dataset/view_sampler/view_sampler_evaluation.py:26-88).  This repo
carries the same tables under assets/ (data, not code); these tests pin
their hashes, verify every preset's test-mode config resolves to one,
and drive `mode=test` end-to-end over synthetic chunks with the EXACT
(context, target) pairs from a shipped index.
"""

import hashlib
import json
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

# Pinned SHA-256 of the shipped tables (byte-identical to the reference's
# assets/ copies; see README "Evaluation protocol").
INDEX_SHA256 = {
    "evaluation_index_re10k.json":
        "4940dbd54f98dec8c0db6854f6ff97456856d437b85e3808fd3747ecca68c8fe",
    "evaluation_index_acid.json":
        "e3983f0e7d2ddda9627478139f6fc4bb1e166fa19a934c33d43bb613e5e1be89",
    "evaluation_index_dl3dv.json":
        "bdbc689c195eb1505b5e619eedf44fc6709a11c74356a010b1e8dd470611b3f1",
    "evaluation_index_dtu.json":
        "8e7d457979217e011ba7c39b941d919402f2983a216b1f411e591eef7c638f07",
    "evaluation_index_scannetpp.json":
        "e0707d73c2de6d79bad9ac95433a18e87646c9d8b15510b10f97a417644833be",
}


class TestShippedIndexTables:
    def test_tables_present_and_pinned(self):
        for name, want in INDEX_SHA256.items():
            path = REPO / "assets" / name
            assert path.exists(), name
            got = hashlib.sha256(path.read_bytes()).hexdigest()
            assert got == want, f"{name}: {got} != pinned {want}"

    def test_every_preset_resolves_to_a_shipped_index(self):
        from spfsplatv2_tpu.config import (
            dataset_entries,
            load_config,
            make_sampler_from_config,
        )
        from spfsplatv2_tpu.data.view_samplers import EvaluationViewSampler

        presets = sorted((REPO / "experiments").glob("*/*.yaml"))
        assert len(presets) == 19
        for preset in presets:
            cfg = load_config([preset])
            entry = dataset_entries(cfg)[0]
            idx = Path(entry.evaluation_sampler.index_path)
            assert idx.name in INDEX_SHA256, preset
            assert (REPO / idx).exists(), preset
            sampler = make_sampler_from_config(cfg, stage="test")
            assert isinstance(sampler, EvaluationViewSampler), preset
            assert len(sampler.index) > 0

    def test_dataset_emits_exact_index_pairs(self, tmp_path):
        """The data pipeline under a shipped index yields EXACTLY the
        frozen (context, target) frames for each scene."""
        from spfsplatv2_tpu.config import load_config, make_sampler_from_config
        from spfsplatv2_tpu.data.chunk_io import save_chunk
        from spfsplatv2_tpu.data.dataset import ChunkedSceneDataset
        from spfsplatv2_tpu.data.synthetic import generate_scene

        index = json.loads(
            (REPO / "assets" / "evaluation_index_dtu.json").read_text()
        )
        scenes = list(index)[:2]  # scan1_train, scan8_train
        root = tmp_path / "dtu" / "test"
        root.mkdir(parents=True)
        save_chunk(
            [generate_scene(s, num_frames=49, image_hw=(64, 64), seed=i)
             for i, s in enumerate(scenes)],
            root / "000000.torch",
        )

        cfg = load_config(
            [REPO / "experiments" / "spfsplatv2" / "dtu.yaml"],
            [
                f"dataset.roots=['{tmp_path / 'dtu'}']",
                "dataset.original_image_shape=[64,64]",
                "dataset.input_image_shape=[64,64]",
                "image_shape=[64,64]",
            ],
        )
        sampler = make_sampler_from_config(cfg, stage="test")
        dataset = ChunkedSceneDataset(cfg.dataset, sampler, stage="test")

        seen = {}
        for example in dataset.epoch(0):
            seen[example["scene"]] = (
                example["context"]["index"].tolist(),
                example["target"]["index"].tolist(),
            )
        assert set(seen) == set(scenes)
        for s in scenes:
            assert seen[s][0] == index[s]["context"], s
            assert seen[s][1] == index[s]["target"], s

    def test_mode_test_runs_reference_protocol(self, tmp_path):
        """`mode=test` + the dtu preset + a shipped index reproduces the
        reference protocol end-to-end: per-scene scores over the frozen
        pairs, with per-target metric lists sized by the index."""
        import jax

        from spfsplatv2_tpu.config import load_config
        from spfsplatv2_tpu.data.chunk_io import save_chunk
        from spfsplatv2_tpu.data.synthetic import generate_scene
        from spfsplatv2_tpu.main import main
        from spfsplatv2_tpu.models import get_encoder
        from spfsplatv2_tpu.training.loop import save_checkpoint
        from tests.test_registry_wiring import TINY_BB, TINY_HEADS

        index = json.loads(
            (REPO / "assets" / "evaluation_index_dtu.json").read_text()
        )
        scene = list(index)[0]
        root = tmp_path / "dtu" / "test"
        root.mkdir(parents=True)
        save_chunk(
            [generate_scene(scene, num_frames=49, image_hw=(32, 32), seed=0)],
            root / "000000.torch",
        )
        out_dir = tmp_path / "out"

        ov = [
            f"dataset.roots=['{tmp_path / 'dtu'}']",
            "dataset.original_image_shape=[32,32]",
            "dataset.input_image_shape=[32,32]",
            "image_shape=[32,32]",
            "mode=test",
            f"test.output_path={out_dir}",
            "test.save_image=false",
            "test.save_video=false",
            "loss.use_lpips=false",
            "encoder.spfsplatv2.sh_degree=1",
        ]
        for k, v in TINY_BB.items():
            ov.append(f"encoder.spfsplatv2.backbone.{k}={v}")
        for k, v in TINY_HEADS.items():
            if k == "sh_degree":
                continue
            vv = list(v) if isinstance(v, tuple) else v
            ov.append(f"encoder.spfsplatv2.{k}={vv}")

        preset = [str(REPO / "experiments" / "spfsplatv2" / "dtu.yaml")]
        cfg = load_config(preset, ov)
        encoder = get_encoder(cfg.encoder)
        rng = np.random.default_rng(0)
        img = np.asarray(rng.uniform(0, 1, (1, 2, 32, 32, 3)), np.float32)
        intr = np.broadcast_to(np.eye(3, dtype=np.float32), (1, 2, 3, 3))
        params = encoder.init(
            jax.random.PRNGKey(0), img, intr, img[:, :1], intr[:, :1]
        )
        ckpt_dir = tmp_path / "ckpt"
        save_checkpoint(ckpt_dir, {"params": jax.device_get(params)}, 0)
        ov.append(f"checkpointing.load={ckpt_dir / 'step_0'}")

        args = []
        for p in preset:
            args += ["--config", p]
        rc = main(args + ov)
        assert rc == 0
        scores = json.loads((out_dir / "scores_all.json").read_text())
        assert len(scores) == 1
        assert scores[0]["scene"] == scene
        # One PSNR per frozen target frame — the protocol's exact pairs.
        assert len(scores[0]["psnr"]) == len(index[scene]["target"])
