"""Test-set evaluator: novel-view synthesis + pose metrics over fixed indices.

TPU-native port of the reference test loop
(reference: src/model/model_wrapper.py:372-645): for each evaluation scene,
run the encoder on context (+ one target view at a time in pose-estimating
mode), render at the predicted target pose, optionally refine the pose by
test-time alignment (evaluation/pose_align.py), score PSNR/SSIM/LPIPS and
pose errors, and dump `scores_all.json` / `benchmark.json` /
`peak_memory.json` artifacts matching the reference protocol.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from spfsplatv2_tpu.evaluation.benchmarker import Benchmarker
from spfsplatv2_tpu.evaluation.metrics import (
    compute_lpips,
    compute_pose_error,
    compute_psnr,
    compute_ssim,
    pose_auc_summary,
)
from spfsplatv2_tpu.models.decoder import DecoderConfig, decode_splatting


@dataclass
class EvalConfig:
    align_pose: bool = False
    pose_align_steps: int = 100
    opt_lr: float = 5e-4
    compute_scores: bool = True
    save_images: bool = False
    output_path: str = "outputs/test"


def evaluate_example(
    encoder,
    params,
    example: dict,
    image_shape: tuple[int, int],
    decoder_cfg: DecoderConfig = DecoderConfig(),
    eval_cfg: EvalConfig = EvalConfig(),
    lpips_params=None,
    benchmarker: Optional[Benchmarker] = None,
) -> dict:
    """Evaluate ONE scene: all target views rendered at predicted poses."""
    bench = benchmarker or Benchmarker()
    ctx, tgt = example["context"], example["target"]
    ctx_img = jnp.asarray(ctx["image"])[None]
    tgt_img = jnp.asarray(tgt["image"])[None]
    ctx_k = jnp.asarray(ctx["intrinsics"])[None]
    tgt_k = jnp.asarray(tgt["intrinsics"])[None]
    v_cxt = ctx_img.shape[1]
    v_tgt = tgt_img.shape[1]

    with bench.time("encoder"):
        out = encoder.apply(params, ctx_img, ctx_k, tgt_img, tgt_k)
        jax.block_until_ready(out["gaussians"].means)

    pred_tgt_poses = out["extrinsics_cwt"][:, v_cxt:]
    near = jnp.asarray(tgt["near"])[None]
    far = jnp.asarray(tgt["far"])[None]

    if eval_cfg.align_pose:
        from spfsplatv2_tpu.evaluation.pose_align import align_poses

        with bench.time("pose_optimize"):
            pred_tgt_poses, _ = align_poses(
                out["gaussians"], pred_tgt_poses, tgt_k, near, far, tgt_img,
                image_shape, steps=eval_cfg.pose_align_steps,
                lr=eval_cfg.opt_lr, decoder_cfg=decoder_cfg,
            )
            jax.block_until_ready(pred_tgt_poses)

    with bench.time("decoder", num_calls=v_tgt):
        rendered = decode_splatting(
            out["gaussians"], pred_tgt_poses, tgt_k, near, far,
            image_shape, decoder_cfg,
        )
        jax.block_until_ready(rendered.color)

    result = {"scene": example.get("scene", "?")}
    pred = rendered.color[0]
    gt = tgt_img[0]
    result["psnr"] = [float(x) for x in compute_psnr(gt, pred)]
    result["ssim"] = [float(x) for x in compute_ssim(gt, pred)]
    if lpips_params is not None:
        result["lpips"] = [float(x) for x in compute_lpips(lpips_params, gt, pred)]

    if "extrinsics" in tgt:
        rot, tr = compute_pose_error(
            pred_tgt_poses[0], jnp.asarray(tgt["extrinsics"])
        )
        result["pose_rot_err_deg"] = [float(x) for x in rot]
        result["pose_transl_err_deg"] = [float(x) for x in tr]
    if "extrinsics" in ctx and out["extrinsics_c"] is not None:
        rot, tr = compute_pose_error(
            out["extrinsics_c"][0], jnp.asarray(ctx["extrinsics"])
        )
        result["context_pose_rot_err_deg"] = [float(x) for x in rot]
        result["context_pose_transl_err_deg"] = [float(x) for x in tr]

    result["images"] = np.asarray(jnp.clip(pred, 0, 1)) if eval_cfg.save_images else None
    return result


def summarize_and_dump(
    results: list[dict], output_path: str | Path, benchmarker: Benchmarker
) -> dict:
    """Aggregate per-scene results into the reference's score artifacts."""
    out_dir = Path(output_path)
    out_dir.mkdir(parents=True, exist_ok=True)

    def flat(key):
        return [x for r in results for x in (r.get(key) or [])]

    summary = {
        "psnr": float(np.mean(flat("psnr"))) if flat("psnr") else None,
        "ssim": float(np.mean(flat("ssim"))) if flat("ssim") else None,
        "lpips": float(np.mean(flat("lpips"))) if flat("lpips") else None,
        "num_scenes": len(results),
    }
    rot = np.asarray(flat("pose_rot_err_deg"), np.float64)
    tr = np.asarray(flat("pose_transl_err_deg"), np.float64)
    if rot.size:
        summary["pose"] = pose_auc_summary(rot, tr)

    scores_all = [
        {k: v for k, v in r.items() if k != "images"} for r in results
    ]
    (out_dir / "scores_all.json").write_text(json.dumps(scores_all, indent=2))
    (out_dir / "scores_all_avg.json").write_text(json.dumps(summary, indent=2))
    benchmarker.dump(out_dir / "benchmark.json")
    benchmarker.dump_memory(out_dir / "peak_memory.json")
    return summary
