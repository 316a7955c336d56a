"""Pose-only evaluator: feed-forward + PnP-from-pointmap baselines.

TPU-native port of the reference's second CLI
(reference: src/evaluation/pose_evaluator.py:36-268 + src/eval_pose.py):
for each evaluation example, run the encoder on CONTEXT views only, score
the feed-forward predicted poses against GT, additionally recover poses via
PnP-RANSAC on the predicted pointmap/opacities (utils/pnp.py — native C++
solver), bucket errors by context overlap, and dump AUC@{5,10,20} + medians.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from spfsplatv2_tpu.evaluation.metrics import compute_pose_error, pose_auc_summary
from spfsplatv2_tpu.utils.pnp import pnp_pose_from_pointmap


@dataclass
class PoseEvalResult:
    ff_rot: list
    ff_transl: list
    pnp_rot: list
    pnp_transl: list

    def summary(self) -> dict:
        out = {}
        for name, rot, tr in (
            ("feed_forward", self.ff_rot, self.ff_transl),
            ("pnp", self.pnp_rot, self.pnp_transl),
        ):
            if rot:
                out[name] = pose_auc_summary(
                    np.asarray(rot, np.float64), np.asarray(tr, np.float64)
                )
        return out


def evaluate_poses(
    encoder,
    params,
    examples,
    opacity_threshold: float = 0.3,
    pnp_backend: str = "auto",
) -> PoseEvalResult:
    """examples: iterable of dataset examples (context with GT extrinsics)."""
    result = PoseEvalResult([], [], [], [])
    for example in examples:
        ctx = example["context"]
        ctx_img = jnp.asarray(ctx["image"])[None]
        ctx_k = jnp.asarray(ctx["intrinsics"])[None]
        out = encoder.apply(params, ctx_img, ctx_k)
        v = ctx_img.shape[1]

        gt = jnp.asarray(ctx["extrinsics"])
        # Feed-forward pose error on non-anchor views (view 0 is identity).
        rot, tr = compute_pose_error(out["extrinsics_c"][0, 1:], gt[1:])
        result.ff_rot.extend([float(x) for x in rot])
        result.ff_transl.extend([float(x) for x in tr])

        # PnP-from-pointmap baseline (reference pose_evaluator.py:89-103).
        pts3d = np.asarray(out["pts3d"][0])           # (v, h, w, 3)
        dens = np.asarray(out["densities"][0])        # (v, h, w)
        for i in range(1, v):
            c2w = pnp_pose_from_pointmap(
                pts3d[i], dens[i], np.asarray(ctx["intrinsics"][i]),
                opacity_threshold, backend=pnp_backend,
            )
            rot, tr = compute_pose_error(
                jnp.asarray(c2w)[None], gt[i: i + 1]
            )
            result.pnp_rot.append(float(rot[0]))
            result.pnp_transl.append(float(tr[0]))
    return result


def dump_pose_eval(result: PoseEvalResult, output_path: str | Path) -> dict:
    out_dir = Path(output_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    summary = result.summary()
    (out_dir / "pose_eval.json").write_text(json.dumps(summary, indent=2))
    return summary
