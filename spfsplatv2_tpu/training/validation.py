"""In-training validation: metrics, comparison sheets, interpolation video.

TPU-native port of the reference's `validation_step`
(reference: src/model/model_wrapper.py:647-808): every
`trainer.val_check_interval` steps, one validation scene is encoded
JOINTLY (context + targets — validation uses joint encoding, unlike the
per-target test protocol), context AND target views are re-rendered from
the predicted Gaussians at predicted poses ("show_context_render"), and

  * val/psnr, val/ssim, val/lpips over target views,
  * val/context/{psnr,ssim,lpips} over re-rendered context views,
  * val/{context,target}_angular_error + _transl_error pose errors,

are returned, while a labeled comparison sheet
(context | context depth | target GT | prediction | depth) and a pose-
interpolation video land in `<out_dir>/validation/step_<n>/`.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from spfsplatv2_tpu.evaluation.metrics import (
    compute_lpips,
    compute_pose_error,
    compute_psnr,
    compute_ssim,
)
from spfsplatv2_tpu.models.decoder import DecoderConfig, decode_splatting
from spfsplatv2_tpu.utils.visualization import (
    apply_depth_colormap,
    hcat,
    save_image,
    vcat,
)


def add_label(image: np.ndarray, label: str) -> np.ndarray:
    """Stamp a tiny 5x3-font label strip above an image (host-side numpy;
    the reference uses PIL text drawing, src/visualization/annotation.py)."""
    from spfsplatv2_tpu.utils.minifont import render_text

    strip = render_text(label, width=image.shape[1])
    return np.concatenate([strip, np.asarray(image, np.float32)], axis=0)


def run_validation_step(
    encoder,
    params,
    example: dict,
    image_shape: tuple[int, int],
    decoder_cfg: DecoderConfig = DecoderConfig(),
    lpips_params=None,
    lpips_calibrated: bool = True,
    out_dir: str | Path | None = None,
    step: int = 0,
    render_video: bool = True,
) -> dict:
    """Validate ONE scene (un-batched example dict). Returns metric dict."""
    ctx, tgt = example["context"], example["target"]
    ctx_img = jnp.asarray(ctx["image"])[None]
    tgt_img = jnp.asarray(tgt["image"])[None]
    ctx_k = jnp.asarray(ctx["intrinsics"])[None]
    tgt_k = jnp.asarray(tgt["intrinsics"])[None]
    v_cxt, v_tgt = ctx_img.shape[1], tgt_img.shape[1]
    h, w = image_shape

    out = encoder.apply(params, ctx_img, ctx_k, tgt_img, tgt_k)
    poses_all = out["extrinsics_cwt"]  # (1, v_cxt + v_tgt, 4, 4)

    # Render BOTH context and target views (show_context_render, reference
    # model_wrapper.py:712-726).
    k_all = jnp.concatenate([ctx_k, tgt_k], axis=1)
    near = jnp.concatenate(
        [jnp.asarray(ctx["near"])[None], jnp.asarray(tgt["near"])[None]], axis=1
    )
    far = jnp.concatenate(
        [jnp.asarray(ctx["far"])[None], jnp.asarray(tgt["far"])[None]], axis=1
    )
    rendered = decode_splatting(
        out["gaussians"], poses_all, k_all, near, far, image_shape, decoder_cfg
    )
    pred = rendered.color[0]  # (v_cxt + v_tgt, h, w, 3)
    gt = jnp.concatenate([ctx_img, tgt_img], axis=1)[0]

    metrics: dict[str, float] = {}

    def block(tag, lo, hi):
        metrics[f"{tag}psnr"] = float(jnp.mean(compute_psnr(gt[lo:hi], pred[lo:hi])))
        metrics[f"{tag}ssim"] = float(jnp.mean(compute_ssim(gt[lo:hi], pred[lo:hi])))
        if lpips_params is not None:
            # Uncalibrated (random-VGG) LPIPS is labeled so its numbers can
            # never be mistaken for published-protocol LPIPS.
            key = "lpips" if lpips_calibrated else "lpips_uncalibrated"
            metrics[f"{tag}{key}"] = float(
                jnp.mean(compute_lpips(lpips_params, gt[lo:hi], pred[lo:hi]))
            )

    block("val/", v_cxt, v_cxt + v_tgt)
    block("val/context/", 0, v_cxt)

    if "extrinsics" in tgt:
        rot, tr = compute_pose_error(
            poses_all[0, v_cxt:], jnp.asarray(tgt["extrinsics"])
        )
        metrics["val/target_angular_error"] = float(jnp.mean(rot))
        metrics["val/target_transl_error"] = float(jnp.mean(tr))
    if "extrinsics" in ctx:
        # Reference validates only the RIGHT context view (v_cxt - 1).
        rot, tr = compute_pose_error(
            poses_all[0, v_cxt - 1 : v_cxt],
            jnp.asarray(ctx["extrinsics"])[v_cxt - 1 : v_cxt],
        )
        metrics["val/context_angular_error"] = float(jnp.mean(rot))
        metrics["val/context_transl_error"] = float(jnp.mean(tr))

    if out_dir is not None:
        step_dir = Path(out_dir) / "validation" / f"step_{step}"
        pred_np = np.asarray(jnp.clip(pred, 0, 1))
        gt_np = np.asarray(jnp.clip(gt, 0, 1))
        depth_np = np.asarray(rendered.depth[0])
        ctx_depth = None
        if "depths" in out:  # encoder per-context-view depth maps
            d = np.asarray(out["depths"][0])
            ctx_depth = vcat(*[apply_depth_colormap(d[i]) for i in range(v_cxt)])
        columns = [
            add_label(vcat(*gt_np[:v_cxt]), "Context"),
        ]
        if ctx_depth is not None:
            columns.append(add_label(ctx_depth, "Context Depth"))
        columns += [
            add_label(vcat(*gt_np[v_cxt:]), "Target (Ground Truth)"),
            add_label(vcat(*pred_np[v_cxt:]), "Prediction"),
            add_label(
                vcat(*[apply_depth_colormap(depth_np[v_cxt + i])
                       for i in range(v_tgt)]),
                "Depth",
            ),
        ]
        save_image(hcat(*columns), step_dir / "comparison.png")

        if render_video:
            from spfsplatv2_tpu.evaluation.video import (
                render_interpolation_video,
                render_wobble_video,
            )

            try:
                render_interpolation_video(
                    encoder, params, ctx, image_shape,
                    num_frames=30, decoder_cfg=decoder_cfg,
                    output_path=step_dir / "interpolation.gif",
                )
                # Wobble video (reference render_video_wobble,
                # model_wrapper.py:805-838).
                render_wobble_video(
                    encoder, params, ctx, image_shape,
                    num_frames=30, decoder_cfg=decoder_cfg,
                    output_path=step_dir / "wobble.gif",
                )
            except Exception as e:  # video is best-effort during training
                print(f"validation video skipped: {e}", flush=True)
    return metrics
