"""CLI entry: train / test, mirroring the reference's `python -m src.main`.

Usage:
    python -m spfsplatv2_tpu.main mode=train dataset.roots='[/data/re10k]' ...
    python -m spfsplatv2_tpu.main mode=test checkpointing.load=outputs/...

(reference: src/main.py:51-223; Hydra overlays are replaced by
`--config path.yaml` files plus dotted `key=value` overrides, config.py.)
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", action="append", default=[])
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from spfsplatv2_tpu.config import load_config

    cfg = load_config(args.config, args.overrides)

    if cfg.mode == "train":
        from spfsplatv2_tpu.training.loop import run_training, save_checkpoint

        def log(step, metrics):
            msg = " ".join(f"{k}={v:.5g}" for k, v in sorted(metrics.items()))
            print(f"step {step}: {msg}", flush=True)

        result = run_training(cfg, log_fn=log)
        save_checkpoint(
            Path(cfg.output_dir) / "checkpoints", result["state"], -1
        )
        print(json.dumps(result["metrics"], indent=2))
        return 0

    if cfg.mode == "test":
        from spfsplatv2_tpu.config import make_sampler_from_config
        from spfsplatv2_tpu.data.dataset import ChunkedSceneDataset
        from spfsplatv2_tpu.evaluation.benchmarker import Benchmarker
        from spfsplatv2_tpu.evaluation.evaluator import (
            EvalConfig,
            evaluate_example,
            summarize_and_dump,
        )
        from spfsplatv2_tpu.models import get_encoder
        from spfsplatv2_tpu.training.loop import load_checkpoint

        encoder = get_encoder(cfg.encoder)
        sampler = make_sampler_from_config(cfg, stage="test")
        dataset = ChunkedSceneDataset(cfg.dataset, sampler, stage="test")

        assert cfg.checkpointing.load, "mode=test requires checkpointing.load"
        restored = load_checkpoint(cfg.checkpointing.load)
        params = restored["params"] if "params" in restored else restored

        from spfsplatv2_tpu.losses.lpips import get_lpips_params

        lpips_params, lpips_calibrated = get_lpips_params(
            cfg.loss.use_lpips, cfg.loss.lpips_weights_path
        )

        eval_cfg = EvalConfig(
            align_pose=cfg.test.align_pose,
            pose_align_steps=cfg.test.pose_align_steps,
            opt_lr=cfg.test.opt_lr,
            compute_scores=cfg.test.compute_scores,
            save_images=cfg.test.save_image,
            save_video=cfg.test.save_video,
            output_path=cfg.test.output_path,
            use_estimated_focal=getattr(
                cfg.encoder.variant_cfg, "estimating_focal", False
            ),
        )
        from spfsplatv2_tpu.evaluation.evaluator import RunningMetricTables

        bench = Benchmarker()
        tables = RunningMetricTables()
        results = []
        for example in dataset.epoch(0):
            results.append(
                evaluate_example(
                    encoder, params, example, tuple(cfg.image_shape),
                    cfg.decoder, eval_cfg, lpips_params=lpips_params,
                    lpips_calibrated=lpips_calibrated,
                    benchmarker=bench,
                )
            )
            # Running console tables after every scene (reference
            # print_preview_metrics, model_wrapper.py:504,987-1046).
            tables.update(results[-1])
            print(tables.render(), flush=True)
        summary = summarize_and_dump(results, cfg.test.output_path, bench)
        print(json.dumps(summary, indent=2))
        return 0

    if cfg.mode == "eval_pose":
        # Pose-only evaluation: feed-forward pose error + PnP-from-pointmap
        # baseline over the test split (reference: python -m src.eval_pose,
        # src/eval_pose.py:46-...).
        from spfsplatv2_tpu.config import make_sampler_from_config
        from spfsplatv2_tpu.data.dataset import ChunkedSceneDataset
        from spfsplatv2_tpu.evaluation.pose_evaluator import (
            dump_pose_eval,
            evaluate_poses,
        )
        from spfsplatv2_tpu.models import get_encoder
        from spfsplatv2_tpu.training.loop import load_checkpoint

        encoder = get_encoder(cfg.encoder)
        sampler = make_sampler_from_config(cfg, stage="test")
        dataset = ChunkedSceneDataset(cfg.dataset, sampler, stage="test")
        assert cfg.checkpointing.load, "mode=eval_pose requires checkpointing.load"
        restored = load_checkpoint(cfg.checkpointing.load)
        params = restored["params"] if "params" in restored else restored

        result = evaluate_poses(encoder, params, dataset.epoch(0))
        summary = dump_pose_eval(result, cfg.test.output_path)
        print(json.dumps(summary, indent=2))
        return 0

    raise SystemExit(f"unknown mode {cfg.mode!r}")


if __name__ == "__main__":
    sys.exit(main())
