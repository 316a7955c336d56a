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
from spfsplatv2_tpu.data.dataset import (
    ChunkedSceneDataset,
    collate,
    concat_batches,
)
from spfsplatv2_tpu.models import get_encoder
from spfsplatv2_tpu.parallel import make_mesh, replicate, shard_batch
from spfsplatv2_tpu.training.optim import FreezeConfig, make_optimizer
from spfsplatv2_tpu.training.step import (
    init_train_state,
    make_train_step,
)


def batch_iterator(
    dataset: ChunkedSceneDataset,
    batch_size: int,
    get_step: Callable[[], int],
    prefetch: int = 2,
) -> Iterator[dict]:
    """Infinite collated batches; curriculum reads the live global step.

    Batch assembly runs in a daemon thread `prefetch` batches ahead so
    host-side decode overlaps device compute (the reference's DataLoader
    prefetching; its worker parallelism lives in DatasetConfig.num_workers).
    """

    def batches() -> Iterator[dict]:
        epoch = 0
        buf: list[dict] = []
        while True:
            # get_step is passed THROUGH so the view-sampler curriculum
            # advances within an epoch.
            n_epoch = 0
            for example in dataset.epoch(epoch, global_step=get_step):
                n_epoch += 1
                buf.append(example)
                if len(buf) == batch_size:
                    yield collate(buf)
                    buf = []
            if n_epoch == 0:
                # Every scene was filtered/skipped (e.g. sampler gaps
                # larger than the scenes' frame counts): spinning through
                # empty epochs forever is a silent hang — fail loudly.
                raise RuntimeError(
                    "dataset epoch yielded zero examples — every scene "
                    "was skipped (check view-sampler distances vs scene "
                    "frame counts, and dataset filters)"
                )
            epoch += 1

    if prefetch <= 0:
        yield from batches()
        return

    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=prefetch)

    def worker():
        try:
            for batch in batches():
                q.put(batch)
        except BaseException as e:  # noqa: BLE001 - surface in consumer
            q.put(e)

    threading.Thread(target=worker, daemon=True,
                     name="batch-prefetch").start()
    while True:
        item = q.get()
        if isinstance(item, BaseException):
            raise item
        yield item


def random_drop_views(batch: dict, rng: np.random.Generator, cfg) -> dict:
    """Random context/target view dropout for multi-view training.

    Reference semantics (dropout_context_views / dropout_target_views,
    src/model/model_wrapper.py:91-116, applied 207-217): keep a random
    count >= 2 of context views (always keeping first and last) and a
    random count >= 1 of target views.

    TPU-native twist: instead of slicing the batch (which changes array
    shapes and forces a full XLA recompile per (v_cxt, v_tgt) combination,
    SURVEY hard part #4), emit STATIC-shape validity masks.  The train step
    excludes masked views from attention, rendering opacity, and all loss
    terms, so one compiled program serves every dropout draw.
    """
    out = dict(batch)
    if cfg.random_drop_context_views:
        v = batch["context"]["image"].shape[1]
        if v > 2:
            keep = int(rng.integers(2, v + 1))
            middle = rng.permutation(np.arange(1, v - 1))[: keep - 2]
            valid = np.zeros((v,), np.float32)
            valid[[0, v - 1]] = 1.0
            valid[middle] = 1.0
            out["context_valid"] = valid
    if cfg.random_drop_target_views:
        v = batch["target"]["image"].shape[1]
        if v > 1:
            keep = int(rng.integers(1, v + 1))
            idx = rng.permutation(v)[:keep]
            valid = np.zeros((v,), np.float32)
            valid[idx] = 1.0
            out["target_valid"] = valid
    return out


def run_training(
    cfg: RootConfig,
    max_steps: Optional[int] = None,
    lpips_params=None,
    log_fn: Optional[Callable[[int, dict], None]] = None,
) -> dict:
    """Train; returns the final TrainState-as-pytree + last metrics."""
    from spfsplatv2_tpu.config import dataset_entries, make_sampler_for_entry

    encoder = get_encoder(cfg.encoder)
    entries = dataset_entries(cfg)
    train_datasets = [
        ChunkedSceneDataset(
            entry.dataset,
            make_sampler_for_entry(entry, "train"),
            stage="train",
            shard_id=jax.process_index(),
            num_shards=jax.process_count(),
            seed=cfg.trainer.seed + 1000 * i,
        )
        for i, entry in enumerate(entries)
    ]

    state_holder = {"step": 0}
    per_dataset = [
        batch_iterator(ds, cfg.trainer.batch_size, lambda: state_holder["step"])
        for ds in train_datasets
    ]
    if len(per_dataset) == 1:
        batches = per_dataset[0]
    else:
        # Heterogeneous multi-dataset training (reference
        # model_wrapper.py:190-205): one batch per dataset per step,
        # concatenated along the batch axis — each dataset keeps its own
        # view sampler / filters; shapes must agree to concatenate.
        def concat_iter():
            for parts in zip(*per_dataset):
                shapes = {p["context"]["image"].shape[1:] for p in parts}
                assert len(shapes) == 1, (
                    f"multi-dataset batches must share view counts and "
                    f"image shapes to concatenate, got {shapes}"
                )
                yield concat_batches(parts)

        batches = concat_iter()
    first = next(batches)

    # Init on the host CPU when driving a remote TPU: eager init at
    # flagship scale is one RPC per op over the tunnel (~10+ min); host
    # init + one device transfer (via replicate() below) takes ~1-2 min.
    init_ctx = None
    if jax.default_backend() == "tpu":
        try:
            plats = jax.config.jax_platforms or "tpu"
            if "cpu" not in plats.split(","):
                jax.config.update("jax_platforms", f"{plats},cpu")
            init_ctx = jax.default_device(jax.devices("cpu")[0])
        except Exception:  # noqa: BLE001 - on-device init still works
            init_ctx = None

    def init_params():
        return encoder.init(
            jax.random.PRNGKey(cfg.trainer.seed),
            jnp.asarray(first["context"]["image"]),
            jnp.asarray(first["context"]["intrinsics"]),
            jnp.asarray(first["target"]["image"]),
            jnp.asarray(first["target"]["intrinsics"]),
        )

    if init_ctx is not None:
        with init_ctx:
            params = init_params()
    else:
        params = init_params()
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

    lpips_calibrated = True
    if lpips_params is None and cfg.loss.use_lpips:
        from spfsplatv2_tpu.losses.lpips import get_lpips_params

        lpips_params, lpips_calibrated = get_lpips_params(
            cfg.loss.use_lpips, cfg.loss.lpips_weights_path
        )

    # Optional DUSt3R/MASt3R distillation teacher for the first
    # `distill_max_steps` steps (reference src/model/distiller/__init__.py:9-24
    # + model_wrapper.py:322-331).  Two step functions are compiled — with and
    # without the teacher forward — and switched host-side at the cutoff.
    distiller = distiller_params = None
    if cfg.train.distiller and cfg.train.distill_max_steps > 0:
        from spfsplatv2_tpu.models.distiller import Dust3RDistiller

        distiller = Dust3RDistiller()
        distiller_params = load_distiller_params(
            distiller, cfg.train.distiller_weights, cfg.trainer.seed,
            tuple(cfg.image_shape),
        )

    optimizer = make_optimizer(
        cfg.optimizer, params,
        freeze=FreezeConfig(
            freeze_pretrained=cfg.train.freeze_pretrained,
            freeze_backbone=cfg.train.freeze_backbone,
            freeze_pose_head=cfg.train.freeze_pose_head,
        ),
    )
    state = init_train_state(encoder, optimizer, params)

    mesh = make_mesh()
    state = replicate(state, mesh)

    start_step = 0
    if cfg.checkpointing.resume:
        restored = restore_latest_checkpoint(
            Path(cfg.output_dir) / "checkpoints", state
        )
        if restored is not None:
            state, start_step = restored
            state = replicate(state, mesh)
            print(f"resumed from step {start_step}", flush=True)

    rng = np.random.default_rng(cfg.trainer.seed + jax.process_index())
    total = max_steps if max_steps is not None else cfg.trainer.max_steps
    ckpt_dir = Path(cfg.output_dir) / "checkpoints"
    metrics = {}
    drop_cfg = cfg.train

    # Validation scene source (reference val dataloader, limit_val_batches=1:
    # one scene per val_check_interval).  Falls back to the train split when
    # no `val` split exists; never fatal.
    val_example = None
    if cfg.trainer.val_check_interval and jax.process_index() == 0:
        try:
            val_ds = ChunkedSceneDataset(
                entries[0].dataset,
                make_sampler_for_entry(entries[0], "val"),
                stage="val",
                seed=cfg.trainer.seed,
            )
            val_example = next(iter(val_ds.epoch(0, global_step=0)))
        except (StopIteration, FileNotFoundError, OSError) as e:
            print(f"validation disabled (no val split): {e}", flush=True)

    def to_device(batch):
        arrays = {
            side: {
                k: jnp.asarray(v)
                for k, v in batch[side].items()
                if k not in ("index", "overlap")
            }
            for side in ("context", "target")
        }
        out = shard_batch(arrays, mesh)
        for key in ("context_valid", "target_valid"):
            if key in batch:
                # (v,) masks are replicated, not batch-sharded.
                out[key] = replicate(jnp.asarray(batch[key]), mesh)
        return out

    # --- build the compiled step, guarded by the HBM-fit check ----------
    # "It compiled" does NOT mean "it fits": an over-budget program pages
    # host<->device silently at ~10x step cost on this runtime
    # (PERFORMANCE.md round-4).  AOT-compile, read XLA's memory_analysis,
    # and auto-halve the accumulation microbatch until the step fits.
    from spfsplatv2_tpu.training.step import (
        HBMBudgetError,
        device_hbm_budget_gb,
    )

    step_kwargs = dict(
        lpips_params=lpips_params,
        training_context=cfg.train.training_context,
    )
    probe_batch = first
    if drop_cfg.random_drop_context_views or drop_cfg.random_drop_target_views:
        probe_batch = random_drop_views(
            first, np.random.default_rng(0), drop_cfg
        )
    probe_dev = to_device(probe_batch)
    eff_batch = int(np.asarray(probe_batch["context"]["image"]).shape[0])
    budget_gb = cfg.trainer.hbm_budget_gb
    if budget_gb is None:
        budget_gb = device_hbm_budget_gb()
    microbatch = cfg.trainer.microbatch or None
    peak_gb = None
    while True:
        step_fn = make_train_step(
            encoder, optimizer, tuple(cfg.image_shape), cfg.decoder,
            cfg.loss, microbatch=microbatch,
            mesh=mesh if mesh.size > 1 else None, **step_kwargs,
        )
        run_step, peak_gb = step_fn.compile_checked(state, probe_dev)
        if peak_gb is not None:
            print(
                f"train step peak HBM {peak_gb:.2f} GB"
                + (f" (budget {budget_gb:.1f} GB)" if budget_gb else ""),
                flush=True,
            )
        if peak_gb is None or budget_gb is None or peak_gb <= budget_gb:
            break
        new_mb = (microbatch or eff_batch) // 2
        if new_mb < 1 or eff_batch % new_mb != 0:
            raise HBMBudgetError(
                f"train step needs {peak_gb:.2f} GB > {budget_gb:.1f} GB "
                f"HBM and microbatch={microbatch} cannot halve further "
                f"(batch {eff_batch}); shrink the batch/model or raise "
                f"trainer.hbm_budget_gb if paging is acceptable"
            )
        print(
            f"WARNING: step peak HBM {peak_gb:.2f} GB > budget "
            f"{budget_gb:.1f} GB — would silently page; halving "
            f"accumulation microbatch {microbatch or eff_batch} -> {new_mb}",
            flush=True,
        )
        microbatch = new_mb
    distill_step_fn = None
    if distiller is not None:
        distill_step_fn = make_train_step(
            encoder, optimizer, tuple(cfg.image_shape), cfg.decoder,
            cfg.loss, distiller=distiller, distiller_params=distiller_params,
            microbatch=microbatch,
            mesh=mesh if mesh.size > 1 else None, **step_kwargs,
        )

    batch = first
    t_start = time.perf_counter()
    for step in range(start_step, total):
        state_holder["step"] = step
        if drop_cfg.random_drop_context_views or drop_cfg.random_drop_target_views:
            batch = random_drop_views(batch, rng, drop_cfg)
        fn = (
            distill_step_fn
            if distill_step_fn is not None and step <= cfg.train.distill_max_steps
            else run_step
        )
        state, metrics = fn(state, to_device(batch))
        if log_fn is not None and step % cfg.train.print_log_every_n_steps == 0:
            logged = {k: float(v) for k, v in metrics.items()}
            if peak_gb is not None:
                logged["mem/peak_hbm_gb"] = peak_gb
            log_fn(step, logged)
        if (
            val_example is not None
            and step > 0
            and step % cfg.trainer.val_check_interval == 0
        ):
            from spfsplatv2_tpu.training.validation import run_validation_step

            val_metrics = run_validation_step(
                encoder,
                jax.device_get(state.params),
                val_example,
                tuple(cfg.image_shape),
                decoder_cfg=cfg.decoder,
                lpips_params=lpips_params,
                lpips_calibrated=lpips_calibrated,
                out_dir=cfg.output_dir,
                step=step,
            )
            print(
                f"[val @ {step}] "
                + " ".join(f"{k.split('/', 1)[1]}={v:.4g}"
                           for k, v in sorted(val_metrics.items())),
                flush=True,
            )
            if log_fn is not None:
                log_fn(step, val_metrics)
        if (
            cfg.checkpointing.every_n_train_steps
            and step > 0
            and step % cfg.checkpointing.every_n_train_steps == 0
        ):
            save_checkpoint(ckpt_dir, state, step)
        if step + 1 < total:
            batch = next(batches)

    metrics = {k: float(v) for k, v in metrics.items()}
    metrics["time/steps_per_s"] = (
        (total - start_step) / (time.perf_counter() - t_start)
    )
    return {"state": state, "metrics": metrics, "encoder": encoder}


def load_distiller_params(
    distiller, weights_path: Optional[str], seed: int,
    image_shape: tuple[int, int],
):
    """Init the teacher and (when a torch checkpoint is given) load
    converted DUSt3R/MASt3R weights (reference get_distiller,
    src/model/distiller/__init__.py:9-24)."""
    import numpy as np

    h, w = image_shape
    params = distiller.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 2, h, w, 3), jnp.float32)
    )
    if weights_path:
        import torch

        from spfsplatv2_tpu.utils.ckpt_convert import (
            convert_dust3r_distiller_checkpoint,
            merge_params,
        )

        sd = torch.load(weights_path, map_location="cpu", weights_only=False)
        sd = sd.get("model", sd.get("state_dict", sd))
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
        params = merge_params(params, convert_dust3r_distiller_checkpoint(sd))
    return params


def restore_latest_checkpoint(ckpt_dir: Path, state_template):
    """Resume support (reference src/main.py:71-90,216): restore the newest
    `step_*` checkpoint into the TrainState template.  Returns
    (state, next_step) or None when no checkpoint exists."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    steps = []
    for p in ckpt_dir.iterdir():
        if p.name.startswith("step_"):
            try:
                steps.append((int(p.name.split("_", 1)[1]), p))
            except ValueError:
                continue
    if not steps:
        return None
    _, latest = max(steps)
    restored = load_checkpoint(latest, target=jax.device_get(state_template))
    state = jax.tree.map(jnp.asarray, restored)
    return state, int(state.step)


def save_checkpoint(ckpt_dir: Path, state, step: int) -> None:
    """Orbax checkpoint save (reference ModelCheckpoint equivalent)."""
    import orbax.checkpoint as ocp

    path = (Path(ckpt_dir) / f"step_{step}").absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)


def resolve_checkpoint_uri(path: str | Path) -> Path:
    """Resolve `wandb://run_id[:version]` checkpoint URIs to a local path.

    Reference: src/misc/wandb_tools.py:43-62 (`download_latest_checkpoint`
    / version_to_int): artifact `model-<run_id>:<version|latest>` is
    downloaded into a local cache dir and its `model.ckpt` used.  Here the
    artifact's directory is the orbax checkpoint.  Requires the `wandb`
    package and login; plain paths pass through untouched.
    """
    path = str(path)
    if not path.startswith("wandb://"):
        return Path(path)
    spec = path[len("wandb://"):]
    run_id, _, version = spec.partition(":")
    version = version or "latest"
    try:
        import wandb
    except ImportError as e:  # pragma: no cover - wandb not in this env
        raise RuntimeError(
            f"checkpoint URI {path!r} needs the `wandb` package "
            "(reference src/misc/wandb_tools.py:43-62)"
        ) from e
    api = wandb.Api()
    artifact = api.artifact(f"model-{run_id}:{version}")
    root = Path("checkpoints") / "wandb" / f"{run_id}_{version}"
    artifact.download(root=str(root))
    return root


def load_checkpoint(path: str | Path, target=None):
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(
            resolve_checkpoint_uri(path).absolute(), item=target
        )
