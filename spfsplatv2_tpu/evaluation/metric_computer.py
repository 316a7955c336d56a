"""Offline metric re-computation over dumped image directories.

TPU-native port of the reference MetricComputer
(reference: src/evaluation/metric_computer.py:19-158): re-scores saved
renderings of one or more methods against ground-truth image dumps
(PSNR/SSIM/LPIPS) and writes side-by-side comparison sheets.

Expected layout: <root>/<method>/<scene>/<frame>.png and
<root>/gt/<scene>/<frame>.png.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from spfsplatv2_tpu.evaluation.metrics import (
    compute_lpips,
    compute_psnr,
    compute_ssim,
)


def _load_image(path: Path) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def compute_metrics_for_methods(
    root: str | Path,
    methods: list[str],
    gt_dir: str = "gt",
    lpips_params=None,
    save_comparison: bool = False,
) -> dict:
    root = Path(root)
    results: dict = {}
    for method in methods:
        scores = {"psnr": [], "ssim": [], "lpips": []}
        for scene_dir in sorted((root / gt_dir).iterdir()):
            if not scene_dir.is_dir():
                continue
            for gt_path in sorted(scene_dir.glob("*.png")):
                pred_path = root / method / scene_dir.name / gt_path.name
                if not pred_path.exists():
                    continue
                gt = jnp.asarray(_load_image(gt_path))[None]
                pred = jnp.asarray(_load_image(pred_path))[None]
                scores["psnr"].append(float(compute_psnr(gt, pred)[0]))
                scores["ssim"].append(float(compute_ssim(gt, pred)[0]))
                if lpips_params is not None:
                    scores["lpips"].append(
                        float(compute_lpips(lpips_params, gt, pred)[0])
                    )
                if save_comparison:
                    from spfsplatv2_tpu.utils.visualization import hcat, save_image

                    sheet = hcat(np.asarray(gt[0]), np.asarray(pred[0]))
                    save_image(
                        sheet,
                        root / "comparisons" / method / scene_dir.name / gt_path.name,
                    )
        results[method] = {
            k: (float(np.mean(v)) if v else None) for k, v in scores.items()
        }
        results[method]["num_images"] = len(scores["psnr"])
    (root / "metric_computer.json").write_text(json.dumps(results, indent=2))
    return results
