"""Evaluation index generation: fixed (context, target) pairs by overlap.

TPU-native equivalent of the reference's EvaluationIndexGenerator
(reference: src/evaluation/evaluation_index_generator.py:19-166, which walks
away from a seed frame until the epipolar overlap falls inside
[min_overlap, max_overlap], then samples target views inside the gap;
overlap computed via src/geometry/epipolar_lines.py project_rays). The
overlap here is computed by densely sampling rays of view A at multiple
depths and measuring the fraction that project inside view B — same
quantity, computed by sampling rather than by line-segment clipping.
Outputs the reference's evaluation-index JSON schema
(assets/evaluation_index_re10k.json): {scene: {context: [...], target: [...]}}.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from spfsplatv2_tpu.geometry import se3
from spfsplatv2_tpu.geometry.projection import sample_image_grid, unproject


@dataclass(frozen=True)
class IndexGeneratorConfig:
    num_target_views: int = 3
    min_overlap: float = 0.4
    max_overlap: float = 0.8
    min_distance: int = 45
    max_distance: int = 200
    output_path: str = "outputs/evaluation_index.json"
    seed: int = 0


def frustum_overlap(
    c2w_a: jax.Array, k_a: jax.Array, c2w_b: jax.Array, k_b: jax.Array,
    grid: int = 16, depths=(0.5, 1.0, 2.0, 4.0, 8.0),
) -> jax.Array:
    """Fraction of view A's rays visible in view B (symmetrized min)."""

    def one_way(c2w_src, k_src, c2w_dst, k_dst):
        coords, _ = sample_image_grid((grid, grid))
        coords = coords.reshape(-1, 2)
        total = 0.0
        for d in depths:
            cam = unproject(coords, jnp.full((grid * grid,), d), k_src)
            world = (
                jnp.einsum("ij,nj->ni", c2w_src[:3, :3], cam) + c2w_src[:3, 3]
            )
            k_px = k_dst  # normalized: "inside" test is in [0, 1]
            xy = se3.project_to_cam(world[None], c2w_dst[None], k_px[None])[0]
            w2c = se3.inverse_se3(c2w_dst)
            z = (
                jnp.einsum("ij,nj->ni", w2c[:3, :3], world) + w2c[:3, 3]
            )[:, 2]
            inside = (
                (xy[:, 0] >= 0) & (xy[:, 0] <= 1)
                & (xy[:, 1] >= 0) & (xy[:, 1] <= 1)
                & (z > 0)
            )
            total = total + jnp.mean(inside.astype(jnp.float32))
        return total / len(depths)

    return jnp.minimum(
        one_way(c2w_a, k_a, c2w_b, k_b), one_way(c2w_b, k_b, c2w_a, k_a)
    )


def generate_index_for_scene(
    extrinsics: np.ndarray,
    intrinsics: np.ndarray,
    cfg: IndexGeneratorConfig,
    rng: np.random.Generator,
):
    """Returns {context: [l, r], target: [...]} or None (no valid pair)."""
    n = extrinsics.shape[0]
    order = rng.permutation(n)
    for seed_frame in order[: min(8, n)]:
        for step in range(cfg.min_distance, cfg.max_distance + 1, 5):
            right = seed_frame + step
            if right >= n:
                break
            ov = float(
                frustum_overlap(
                    jnp.asarray(extrinsics[seed_frame]),
                    jnp.asarray(intrinsics[seed_frame]),
                    jnp.asarray(extrinsics[right]),
                    jnp.asarray(intrinsics[right]),
                )
            )
            if ov < cfg.min_overlap:
                break
            if ov <= cfg.max_overlap:
                inner = np.arange(seed_frame + 1, right)
                if len(inner) < cfg.num_target_views:
                    break
                target = np.sort(
                    rng.choice(inner, cfg.num_target_views, replace=False)
                )
                return {
                    "context": [int(seed_frame), int(right)],
                    "target": [int(t) for t in target],
                    "overlap": ov,
                }
    return None


def generate_index(dataset, cfg: IndexGeneratorConfig) -> dict:
    """dataset: iterable of raw chunk examples (data/chunk_io.load_chunk)."""
    from spfsplatv2_tpu.data.chunk_io import decode_poses

    rng = np.random.default_rng(cfg.seed)
    index = {}
    for example in dataset:
        extrinsics, intrinsics = decode_poses(example["cameras"])
        index[example["key"]] = generate_index_for_scene(
            extrinsics, intrinsics, cfg, rng
        )
    out = Path(cfg.output_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(index, indent=2))
    return index
