import numpy as np
import pytest

from spfsplatv2_tpu.data import (
    ChunkedSceneDataset,
    DatasetConfig,
    collate,
)
from spfsplatv2_tpu.data.chunk_io import (
    decode_jpeg,
    decode_poses,
    encode_jpeg,
    load_chunk,
    save_chunk,
)
from spfsplatv2_tpu.data.shims import (
    apply_augmentation,
    center_crop,
    reflect_extrinsics,
    rescale_and_crop,
)
from spfsplatv2_tpu.data.view_samplers import (
    BoundedSamplerConfig,
    BoundedViewSampler,
    make_view_sampler,
)
from spfsplatv2_tpu.data.synthetic import generate_scene, write_synthetic_dataset


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return write_synthetic_dataset(
        root, num_scenes=2, num_frames=24, image_hw=(90, 160)
    )


class TestChunkIO:
    def test_roundtrip(self, tmp_path):
        scene = generate_scene("abc", num_frames=4, image_hw=(45, 80))
        save_chunk([scene], tmp_path / "c.torch")
        loaded = load_chunk(tmp_path / "c.torch")
        assert loaded[0]["key"] == "abc"
        np.testing.assert_allclose(loaded[0]["cameras"], scene["cameras"])
        img = decode_jpeg(loaded[0]["images"][0])
        assert img.shape == (45, 80, 3)

    def test_decode_poses(self):
        scene = generate_scene("abc", num_frames=4, image_hw=(45, 80))
        c2w, k = decode_poses(scene["cameras"])
        assert c2w.shape == (4, 4, 4)
        # c2w must be a rigid transform.
        r = c2w[:, :3, :3]
        np.testing.assert_allclose(
            r @ r.transpose(0, 2, 1), np.tile(np.eye(3), (4, 1, 1)), atol=1e-5
        )
        assert np.allclose(k[:, 2], [0, 0, 1])

    def test_jpeg_roundtrip(self):
        # Smooth gradient (JPEG-friendly); noise would be destroyed by
        # chroma subsampling regardless of implementation.
        y, x = np.mgrid[0:32, 0:32] / 32.0
        img = np.stack([x, y, 0.5 * (x + y)], axis=-1).astype(np.float32)
        out = decode_jpeg(encode_jpeg(img, quality=100))
        assert out.shape == img.shape
        assert np.abs(out - img).mean() < 0.02


class TestSamplers:
    def test_bounded_gap_schedule(self):
        cfg = BoundedSamplerConfig(
            min_distance_between_context_views=10,
            max_distance_between_context_views=20,
            initial_min_distance_between_context_views=2,
            initial_max_distance_between_context_views=4,
            warm_up_steps=100,
        )
        s = BoundedViewSampler(cfg, "train")
        rng = np.random.default_rng(0)
        ctx0, _ = s.sample("x", 60, rng, global_step=0)
        assert 2 <= ctx0[-1] - ctx0[0] <= 4
        ctx1, _ = s.sample("x", 60, rng, global_step=100)
        assert 10 <= ctx1[-1] - ctx1[0] <= 20

    def test_bounded_test_mode(self):
        cfg = BoundedSamplerConfig(max_distance_between_context_views=10)
        s = BoundedViewSampler(cfg, "test")
        ctx, tgt = s.sample("x", 60, np.random.default_rng(0))
        assert ctx[0] == 0 and ctx[-1] == 10
        np.testing.assert_array_equal(tgt, np.arange(0, 11))

    def test_bounded_multicontext(self):
        cfg = BoundedSamplerConfig(
            num_context_views=4,
            min_distance_between_context_views=10,
            max_distance_between_context_views=20,
            warm_up_steps=0,
        )
        s = BoundedViewSampler(cfg, "train")
        ctx, _ = s.sample("x", 60, np.random.default_rng(1))
        assert len(ctx) == 4
        assert len(set(ctx.tolist())) == 4
        assert all(ctx[0] < c < ctx[-1] for c in ctx[1:-1])

    def test_evaluation_sampler(self, tmp_path):
        import json

        index = {"scene_a": {"context": [3, 9], "target": [5, 6]}, "bad": None}
        p = tmp_path / "index.json"
        p.write_text(json.dumps(index))
        from spfsplatv2_tpu.data.view_samplers import EvaluationSamplerConfig

        s = make_view_sampler(
            "evaluation", EvaluationSamplerConfig(index_path=str(p)), "test"
        )
        ctx, tgt = s.sample("scene_a", 20)
        np.testing.assert_array_equal(ctx, [3, 9])
        np.testing.assert_array_equal(tgt, [5, 6])
        with pytest.raises(ValueError):
            s.sample("bad", 20)


class TestShims:
    def test_center_crop_intrinsics(self):
        images = np.zeros((1, 100, 200, 3), np.float32)
        k = np.tile(np.eye(3, dtype=np.float32), (1, 1, 1))
        out, k2 = center_crop(images, k, (50, 50))
        assert out.shape == (1, 50, 50, 3)
        assert k2[0, 0, 0] == pytest.approx(4.0)  # fx * 200/50
        assert k2[0, 1, 1] == pytest.approx(2.0)

    def test_reflect_extrinsics_involution(self):
        rng = np.random.default_rng(0)
        from scipy.spatial.transform import Rotation

        e = np.eye(4, dtype=np.float32)
        e[:3, :3] = Rotation.random(random_state=0).as_matrix()
        e[:3, 3] = rng.uniform(-1, 1, 3)
        r = reflect_extrinsics(reflect_extrinsics(e[None]))
        np.testing.assert_allclose(r[0], e, atol=1e-6)

    def test_rescale_and_crop(self):
        images = np.random.default_rng(0).uniform(size=(2, 90, 160, 3)).astype(np.float32)
        k = np.tile(np.eye(3, dtype=np.float32)[None], (2, 1, 1))
        out, k2 = rescale_and_crop(images, k, (64, 64))
        assert out.shape == (2, 64, 64, 3)


class TestDataset:
    def _make(self, synthetic_root, **kw):
        cfg = DatasetConfig(
            roots=(str(synthetic_root),),
            input_image_shape=(64, 64),
            original_image_shape=(90, 160),
            **kw,
        )
        sampler = BoundedViewSampler(
            BoundedSamplerConfig(
                min_distance_between_context_views=5,
                max_distance_between_context_views=10,
                warm_up_steps=0,
                num_target_views=2,
            ),
            "train",
        )
        return ChunkedSceneDataset(cfg, sampler, "train")

    def test_iterate_and_collate(self, synthetic_root):
        ds = self._make(synthetic_root)
        examples = []
        for ex in ds.epoch(0):
            examples.append(ex)
            if len(examples) == 2:
                break
        batch = collate(examples)
        assert batch["context"]["image"].shape == (2, 2, 64, 64, 3)
        assert batch["target"]["image"].shape == (2, 2, 64, 64, 3)
        assert batch["context"]["extrinsics"].shape == (2, 2, 4, 4)
        # relative_pose: first context view is identity
        np.testing.assert_allclose(
            batch["context"]["extrinsics"][:, 0],
            np.tile(np.eye(4), (2, 1, 1)),
            atol=1e-5,
        )
        # make_baseline_1: context baseline is 1
        base = np.linalg.norm(
            batch["context"]["extrinsics"][:, -1, :3, 3]
            - batch["context"]["extrinsics"][:, 0, :3, 3],
            axis=-1,
        )
        np.testing.assert_allclose(base, 1.0, atol=1e-4)

    def test_overfit_to_scene(self, synthetic_root):
        ds = self._make(synthetic_root, overfit_to_scene="scene_000")
        for ex in ds.epoch(0):
            assert ex["scene"] == "scene_000"
            break

    def test_sharding_partitions_chunks(self, synthetic_root):
        # With one chunk and 2 shards, shard 1 gets nothing.
        ds0 = self._make(synthetic_root)
        ds0.shard_id, ds0.num_shards = 0, 2
        ds1 = self._make(synthetic_root)
        ds1.shard_id, ds1.num_shards = 1, 2
        n0 = sum(1 for _ in ds0.epoch(0))
        n1 = sum(1 for _ in ds1.epoch(0))
        assert n0 > 0 and n1 == 0


def test_parallel_workers_do_not_change_the_stream(tmp_path):
    """num_workers only changes throughput: the ordered window + sequential
    child-RNG spawning must yield byte-identical examples for any count."""
    import numpy as np

    from spfsplatv2_tpu.data.synthetic import write_synthetic_dataset
    from spfsplatv2_tpu.data.dataset import ChunkedSceneDataset, DatasetConfig
    from spfsplatv2_tpu.data.view_samplers import (
        BoundedSamplerConfig,
        BoundedViewSampler,
    )

    root = tmp_path / "ds"
    write_synthetic_dataset(root, num_scenes=3, num_frames=30,
                            image_hw=(96, 128))
    sampler = BoundedViewSampler(
        BoundedSamplerConfig(
            min_distance_between_context_views=4,
            max_distance_between_context_views=8,
            warm_up_steps=0,
        ),
        stage="train",
    )

    def stream(workers):
        cfg = DatasetConfig(
            roots=(str(root),), input_image_shape=(64, 64),
            original_image_shape=(96, 128), num_workers=workers,
        )
        ds = ChunkedSceneDataset(cfg, sampler, stage="train", seed=3)
        return list(ds.epoch(0))

    a, b = stream(0), (stream(4))
    assert len(a) == len(b) > 0
    for ea, eb in zip(a, b):
        assert ea["scene"] == eb["scene"]
        np.testing.assert_array_equal(
            ea["context"]["image"], eb["context"]["image"]
        )
        np.testing.assert_array_equal(
            ea["target"]["extrinsics"], eb["target"]["extrinsics"]
        )


class TestBoundsAndPatchShims:
    """Library shims (reference src/dataset/shims/{bounds,patch}_shim.py)."""

    def _example(self, v=2, h=32, w=32):
        rng = np.random.default_rng(0)
        extr = np.broadcast_to(np.eye(4, dtype=np.float32), (v, 4, 4)).copy()
        extr[1, 0, 3] = 1.0  # baseline 1
        intr = np.broadcast_to(
            np.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]],
                       np.float32), (v, 3, 3)).copy()
        views = {
            "image": np.asarray(rng.uniform(0, 1, (v, h, w, 3)), np.float32),
            "intrinsics": intr,
            "extrinsics": extr,
            "near": np.ones((v,), np.float32),
            "far": np.full((v,), 100.0, np.float32),
        }
        return {"context": views, "target": {k: v_.copy() for k, v_ in views.items()}}

    def test_bounds_shim_disparity_math(self):
        from spfsplatv2_tpu.data.shims import apply_bounds_shim

        ex = self._example()
        out = apply_bounds_shim(ex, near_disparity=32.0, far_disparity=1.0)
        # fx = fy = 1 (normalized), 32x32 image -> pixel size 1/32 at depth 1.
        # near = baseline / (32 * 1/32) = 1; far = baseline / (1 * 1/32) = 32.
        np.testing.assert_allclose(out["context"]["near"], 1.0, rtol=1e-5)
        np.testing.assert_allclose(out["context"]["far"], 32.0, rtol=1e-5)
        np.testing.assert_allclose(out["target"]["near"], 1.0, rtol=1e-5)
        # original untouched
        assert ex["context"]["near"][0] == 1.0

    def test_patch_shim_crops_and_fixes_intrinsics(self):
        from spfsplatv2_tpu.data.shims import apply_patch_shim

        ex = self._example(h=34, w=38)
        out = apply_patch_shim(ex, patch_size=16)
        assert out["context"]["image"].shape[1:3] == (32, 32)
        # fx scaled by w / w_new = 38/32
        np.testing.assert_allclose(
            out["context"]["intrinsics"][:, 0, 0], 38 / 32, rtol=1e-6
        )
        np.testing.assert_allclose(
            out["context"]["intrinsics"][:, 1, 1], 34 / 32, rtol=1e-6
        )
