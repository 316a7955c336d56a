"""Metric/image logging: JSONL scalars + PNG dumps (wandb-compatible hook).

TPU-native replacement for the reference's wandb/LocalLogger stack
(reference: src/main.py:68-114, src/misc/LocalLogger.py:12-48): scalars
stream to `metrics.jsonl`, images/videos to files under the run directory.
A `wandb` backend engages automatically when the package + an API key are
available (absent in this environment).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np


class LocalLogger:
    def __init__(self, output_dir: str | Path, flush_every: int = 20):
        self.dir = Path(output_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._file = open(self.dir / "metrics.jsonl", "a")
        self._since_flush = 0
        self._flush_every = flush_every
        self._wandb = None
        try:
            import wandb  # noqa: F401

            if wandb.api.api_key:
                self._wandb = wandb
        except Exception:
            pass

    def log_scalars(self, step: int, scalars: dict) -> None:
        record = {"step": step, "time": time.time(), **scalars}
        self._file.write(json.dumps(record) + "\n")
        self._since_flush += 1
        if self._since_flush >= self._flush_every:
            self._file.flush()
            self._since_flush = 0
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)

    def log_image(self, step: int, name: str, image: np.ndarray) -> None:
        from spfsplatv2_tpu.utils.visualization import save_image

        save_image(image, self.dir / "images" / f"{name}_{step:08d}.png")

    def log_video(self, step: int, name: str, frames: list) -> None:
        from spfsplatv2_tpu.utils.visualization import save_video

        save_video(frames, self.dir / "videos" / f"{name}_{step:08d}.gif")

    def close(self) -> None:
        self._file.close()
