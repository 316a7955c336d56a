"""Training loop orchestration (the reference's Lightning Trainer role).

TPU-native replacement for `src/main.py` + `ModelWrapper` training plumbing
(reference: src/main.py:56-216, src/model/model_wrapper.py): builds the
encoder/optimizer/train-step, streams batches from the chunked dataset,
drives curriculum via the global step (no StepTracker shared memory —
the sampler is host-side), checkpoints with orbax, and logs metrics.

Multi-host: `jax.distributed.initialize()` before `run_training`; each host
feeds its dataset shard; parameters are replicated over the mesh and
gradients all-reduced by XLA inside the jitted step.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spfsplatv2_tpu.config import RootConfig
from spfsplatv2_tpu.data.dataset import ChunkedSceneDataset, collate
from spfsplatv2_tpu.data.view_samplers import BoundedViewSampler
from spfsplatv2_tpu.models.encoder import SPFSplatV2Encoder
from spfsplatv2_tpu.parallel import make_mesh, replicate, shard_batch
from spfsplatv2_tpu.training.optim import make_optimizer
from spfsplatv2_tpu.training.step import (
    init_train_state,
    make_train_step,
)


def batch_iterator(
    dataset: ChunkedSceneDataset,
    batch_size: int,
    get_step: Callable[[], int],
) -> Iterator[dict]:
    """Infinite collated batches; curriculum reads the live global step."""
    epoch = 0
    buf: list[dict] = []
    while True:
        for example in dataset.epoch(epoch, global_step=get_step()):
            buf.append(example)
            if len(buf) == batch_size:
                yield collate(buf)
                buf = []
        epoch += 1


def random_drop_views(batch: dict, rng: np.random.Generator, cfg) -> dict:
    """Random context/target view dropout for multi-view training.

    Reference: dropout_context_views / dropout_target_views
    (src/model/model_wrapper.py:91-116, applied 207-217): keep a random
    count >= 2 of context views (always keeping first and last) and a random
    count >= 1 of target views.
    """
    out = dict(batch)
    if cfg.random_drop_context_views:
        v = batch["context"]["image"].shape[1]
        if v > 2:
            keep = int(rng.integers(2, v + 1))
            middle = rng.permutation(np.arange(1, v - 1))[: keep - 2]
            idx = np.sort(np.concatenate([[0], middle, [v - 1]]))
            out["context"] = {
                k: x[:, idx] if getattr(x, "ndim", 0) > 1 else x
                for k, x in batch["context"].items()
            }
    if cfg.random_drop_target_views:
        v = batch["target"]["image"].shape[1]
        if v > 1:
            keep = int(rng.integers(1, v + 1))
            idx = np.sort(rng.permutation(v)[:keep])
            out["target"] = {
                k: x[:, idx] if getattr(x, "ndim", 0) > 1 else x
                for k, x in batch["target"].items()
            }
    return out


def run_training(
    cfg: RootConfig,
    max_steps: Optional[int] = None,
    lpips_params=None,
    log_fn: Optional[Callable[[int, dict], None]] = None,
) -> dict:
    """Train; returns the final TrainState-as-pytree + last metrics."""
    encoder = SPFSplatV2Encoder(cfg.encoder)
    sampler = BoundedViewSampler(cfg.view_sampler, stage="train")
    dataset = ChunkedSceneDataset(
        cfg.dataset,
        sampler,
        stage="train",
        shard_id=jax.process_index(),
        num_shards=jax.process_count(),
        seed=cfg.trainer.seed,
    )

    state_holder = {"step": 0}
    batches = batch_iterator(
        dataset, cfg.trainer.batch_size, lambda: state_holder["step"]
    )
    first = next(batches)

    params = encoder.init(
        jax.random.PRNGKey(cfg.trainer.seed),
        jnp.asarray(first["context"]["image"]),
        jnp.asarray(first["context"]["intrinsics"]),
        jnp.asarray(first["target"]["image"]),
        jnp.asarray(first["target"]["intrinsics"]),
    )
    if cfg.checkpointing.pretrained_weights:
        from spfsplatv2_tpu.utils.ckpt_convert import (
            convert_spfsplat_checkpoint,
            merge_params,
        )
        import torch

        sd = torch.load(
            cfg.checkpointing.pretrained_weights, map_location="cpu",
            weights_only=False,
        )
        sd = sd.get("model", sd.get("state_dict", sd))
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
        params = merge_params(params, convert_spfsplat_checkpoint(sd))

    if lpips_params is None and cfg.loss.use_lpips:
        from spfsplatv2_tpu.losses.lpips import (
            init_lpips_params,
            load_torch_lpips_weights,
        )

        if cfg.loss.lpips_weights_path:
            import torch

            sd = torch.load(cfg.loss.lpips_weights_path, map_location="cpu")
            sd = {k: v.numpy() for k, v in sd.items()}
            lpips_params = load_torch_lpips_weights(sd)
        else:
            print(
                "WARNING: no LPIPS weights path; using deterministic random "
                "VGG features (set loss.lpips_weights_path for canonical LPIPS)"
            )
            lpips_params = init_lpips_params()

    optimizer = make_optimizer(cfg.optimizer, params)
    step_fn = make_train_step(
        encoder, optimizer, tuple(cfg.image_shape), cfg.decoder, cfg.loss,
        lpips_params=lpips_params,
        training_context=cfg.train.training_context,
    )
    state = init_train_state(encoder, optimizer, params)

    mesh = make_mesh()
    state = replicate(state, mesh)

    rng = np.random.default_rng(cfg.trainer.seed + jax.process_index())
    total = max_steps if max_steps is not None else cfg.trainer.max_steps
    ckpt_dir = Path(cfg.output_dir) / "checkpoints"
    metrics = {}
    drop_cfg = cfg.train

    def to_device(batch):
        arrays = {
            side: {
                k: jnp.asarray(v)
                for k, v in batch[side].items()
                if k != "index"
            }
            for side in ("context", "target")
        }
        return shard_batch(arrays, mesh)

    batch = first
    t_start = time.perf_counter()
    for step in range(total):
        state_holder["step"] = step
        if drop_cfg.random_drop_context_views or drop_cfg.random_drop_target_views:
            batch = random_drop_views(batch, rng, drop_cfg)
        state, metrics = step_fn(state, to_device(batch))
        if log_fn is not None and step % cfg.train.print_log_every_n_steps == 0:
            log_fn(step, {k: float(v) for k, v in metrics.items()})
        if (
            cfg.checkpointing.every_n_train_steps
            and step > 0
            and step % cfg.checkpointing.every_n_train_steps == 0
        ):
            save_checkpoint(ckpt_dir, state, step)
        if step + 1 < total:
            batch = next(batches)

    metrics = {k: float(v) for k, v in metrics.items()}
    metrics["time/steps_per_s"] = total / (time.perf_counter() - t_start)
    return {"state": state, "metrics": metrics, "encoder": encoder}


def save_checkpoint(ckpt_dir: Path, state, step: int) -> None:
    """Orbax checkpoint save (reference ModelCheckpoint equivalent)."""
    import orbax.checkpoint as ocp

    path = (Path(ckpt_dir) / f"step_{step}").absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)


def load_checkpoint(path: str | Path, target=None):
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(Path(path).absolute(), item=target)
