"""Experiment preset tests: the 19 shipped recipes reproduce the reference
experiment YAMLs (reference: config/experiment/{spfsplat,spfsplatv2,
spfsplatv2-l}/*.yaml composed over config/main.yaml + config/dataset/*),
and heterogeneous multi-dataset training yields mixed batches
(reference: src/dataset/__init__.py:12-17, model_wrapper.py:190-205)."""

from pathlib import Path

import numpy as np
import pytest

from spfsplatv2_tpu.config import (
    dataset_entries,
    load_config,
    make_sampler_for_entry,
)
from spfsplatv2_tpu.data import ChunkedSceneDataset, DatasetConfig
from spfsplatv2_tpu.data.dataset import concat_batches
from spfsplatv2_tpu.data.synthetic import write_synthetic_dataset
from spfsplatv2_tpu.data.view_samplers import (
    BoundedSamplerConfig,
    BoundedViewSampler,
)
from spfsplatv2_tpu.training.loop import batch_iterator

ROOT = Path(__file__).resolve().parent.parent
EXPERIMENTS = ROOT / "experiments"

# (family, name) -> key reference recipe values:
# (encoder, batch, max_steps, n_datasets, ctx_views, sampler_max_gap,
#  warm_up, reproj_weight, image_hw)
REFERENCE_RECIPES = {
    ("spfsplat", "re10k"): ("spfsplat", 12, 400_001, 1, 2, 150, 200_000, 1e-3, 256),
    ("spfsplat", "acid"): ("spfsplat", 12, 300_001, 1, 2, 90, 150_000, 1e-3, 256),
    ("spfsplat", "dtu"): ("spfsplat", 16, 300_001, 1, 2, 90, 150_000, 0.0, 256),
    ("spfsplat", "re10k_3view"): ("spfsplat", 10, 200_001, 1, 3, 150, 0, 1e-3, 256),
    ("spfsplat", "re10k_dl3dv"): ("spfsplat", 6, 600_001, 2, 2, 150, 300_000, 1e-3, 256),
    ("spfsplatv2", "re10k"): ("spfsplatv2", 16, 300_001, 1, 2, 150, 200_000, 1e-3, 256),
    ("spfsplatv2", "acid"): ("spfsplatv2", 16, 300_001, 1, 2, 90, 150_000, 1e-3, 256),
    ("spfsplatv2", "dl3dv"): ("spfsplatv2", 16, 300_001, 1, 2, 10, 150_000, 1e-3, 256),
    ("spfsplatv2", "dtu"): ("spfsplatv2", 16, 300_001, 1, 2, 90, 150_000, 0.0, 256),
    ("spfsplatv2", "re10k_10view"): ("spfsplatv2", 3, 600_001, 1, 10, 150, 300_000, 1e-3, 256),
    ("spfsplatv2", "re10k_dl3dv"): ("spfsplatv2", 8, 600_001, 2, 2, 150, 300_000, 1e-3, 256),
    ("spfsplatv2", "scannetpp"): ("spfsplatv2", 16, 300_001, 1, 2, 6, 150_000, 1e-3, 256),
    ("spfsplatv2-l", "re10k"): ("spfsplatv2l", 10, 400_001, 1, 2, 150, 200_000, 1e-3, 224),
    ("spfsplatv2-l", "acid"): ("spfsplatv2l", 10, 400_001, 1, 2, 150, 200_000, 1e-3, 224),
    ("spfsplatv2-l", "dl3dv"): ("spfsplatv2l", 16, 300_001, 1, 2, 10, 150_000, 1e-3, 224),
    ("spfsplatv2-l", "dtu"): ("spfsplatv2l", 16, 300_001, 1, 2, 90, 150_000, 0.0, 224),
    ("spfsplatv2-l", "re10k_10view"): ("spfsplatv2l", 2, 600_001, 1, 10, 150, 300_000, 1e-3, 224),
    ("spfsplatv2-l", "re10k_dl3dv"): ("spfsplatv2l", 5, 600_001, 2, 2, 150, 300_000, 1e-3, 224),
    ("spfsplatv2-l", "scannetpp"): ("spfsplatv2l", 10, 300_001, 1, 2, 6, 150_000, 1e-3, 224),
}


def test_all_reference_recipes_are_shipped():
    shipped = {
        (p.parent.name, p.stem) for p in EXPERIMENTS.rglob("*.yaml")
    }
    assert shipped == set(REFERENCE_RECIPES), (
        "experiments/ tree out of sync with the reference recipe table"
    )


@pytest.mark.parametrize("family,name", sorted(REFERENCE_RECIPES))
def test_preset_matches_reference_recipe(family, name):
    (enc, batch, max_steps, n_ds, ctx, max_gap, warm_up, reproj_w,
     side) = REFERENCE_RECIPES[(family, name)]
    cfg = load_config([EXPERIMENTS / family / f"{name}.yaml"], [])
    assert cfg.encoder.name == enc
    assert cfg.trainer.batch_size == batch
    assert cfg.trainer.max_steps == max_steps
    # Scheduler horizon follows the trainer budget (reference reads
    # trainer.max_steps via the global cfg, model_wrapper.py:1101).
    assert cfg.optimizer.max_steps == max_steps
    assert cfg.loss.reproj.weight == reproj_w
    assert cfg.loss.reproj.total_iterations == max_steps
    assert cfg.image_shape == (side, side)

    entries = dataset_entries(cfg)
    assert len(entries) == n_ds
    first = entries[0]
    assert first.view_sampler.num_context_views == ctx
    assert first.view_sampler.max_distance_between_context_views == max_gap
    assert first.view_sampler.warm_up_steps == warm_up
    assert first.dataset.input_image_shape == (side, side)
    # Reference near/far: 0.1 / 100 scaled by baseline
    # (dataset_re10k.py:65-66,203-213).
    assert first.dataset.near == pytest.approx(0.1)
    assert first.dataset.far == pytest.approx(100.0)
    for entry in entries:
        sampler = make_sampler_for_entry(entry, "train")
        assert isinstance(sampler, BoundedViewSampler)

    if name == "re10k_10view":
        assert cfg.train.random_drop_context_views
    if name == "dtu":
        assert not entries[0].dataset.skip_bad_shape
        assert cfg.test.pose_align_steps == 200
    if family == "spfsplatv2-l":
        # VGGT grad-skip threshold 20 (reference model_wrapper.py:1121).
        assert cfg.optimizer.max_grad_skip == 20.0
    if name == "re10k_dl3dv":
        dl = entries[1]
        assert dl.name == "dl3dv"
        assert dl.view_sampler.max_distance_between_context_views == 10
        assert dl.view_sampler.min_distance_between_context_views == 8
        assert dl.dataset.original_image_shape == (270, 480)


def test_overrides_compose_over_preset():
    cfg = load_config(
        [EXPERIMENTS / "spfsplatv2" / "re10k.yaml"],
        ["trainer.batch_size=2", "dataset.roots=[/tmp/x]"],
    )
    assert cfg.trainer.batch_size == 2
    assert cfg.dataset.roots == ("/tmp/x",)
    assert cfg.trainer.max_steps == 300_001  # preset value survives


class TestMultiDatasetTraining:
    @pytest.fixture(scope="class")
    def two_roots(self, tmp_path_factory):
        root_a = write_synthetic_dataset(
            tmp_path_factory.mktemp("ds_a"), num_scenes=2, num_frames=24,
            image_hw=(90, 160),
        )
        root_b = write_synthetic_dataset(
            tmp_path_factory.mktemp("ds_b"), num_scenes=2, num_frames=24,
            image_hw=(90, 160),
        )
        return root_a, root_b

    def test_mixed_batches(self, two_roots):
        """Two datasets, different view samplers -> concatenated batches.

        Mirrors the reference re10k_dl3dv recipes: per-dataset loaders with
        their own gap bounds, batches torch.cat-ed each step
        (model_wrapper.py:190-205)."""
        root_a, root_b = two_roots
        shape = (32, 32)
        ds_a = ChunkedSceneDataset(
            DatasetConfig(roots=(str(root_a),), input_image_shape=shape,
                          original_image_shape=(90, 160), num_workers=0),
            BoundedViewSampler(BoundedSamplerConfig(
                min_distance_between_context_views=12,
                max_distance_between_context_views=18, warm_up_steps=0,
            )),
            seed=0,
        )
        ds_b = ChunkedSceneDataset(
            DatasetConfig(roots=(str(root_b),), input_image_shape=shape,
                          original_image_shape=(90, 160), num_workers=0),
            BoundedViewSampler(BoundedSamplerConfig(
                min_distance_between_context_views=2,
                max_distance_between_context_views=4, warm_up_steps=0,
            )),
            seed=1,
        )
        iters = [
            batch_iterator(ds, 2, lambda: 0, prefetch=0)
            for ds in (ds_a, ds_b)
        ]
        batch = concat_batches([next(it) for it in iters])
        assert batch["context"]["image"].shape == (4, 2, *shape, 3)
        assert batch["target"]["image"].shape[0] == 4
        assert len(batch["scene"]) == 4
        # Each half obeys ITS dataset's gap bounds.
        gaps = batch["context"]["index"][:, -1] - batch["context"]["index"][:, 0]
        assert (gaps[:2] >= 12).all() and (gaps[:2] <= 18).all()
        assert (gaps[2:] >= 2).all() and (gaps[2:] <= 4).all()

    def test_concat_drops_non_shared_keys(self):
        a = {"scene": ["x"], "context": {"image": np.zeros((1, 2)),
                                         "overlap": np.ones((1,))},
             "target": {"image": np.zeros((1, 2))}}
        b = {"scene": ["y"], "context": {"image": np.ones((1, 2))},
             "target": {"image": np.ones((1, 2))}}
        out = concat_batches([a, b])
        assert "overlap" not in out["context"]
        assert out["context"]["image"].shape == (2, 2)
