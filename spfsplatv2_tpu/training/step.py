"""Jitted training step: encoder -> render -> losses -> AdamW update.

TPU-native equivalent of the reference training loop body
(reference: src/model/model_wrapper.py:189-370 + optimizer_step 1113-1151),
as one functional `train_step` compiled by XLA. The NaN/large-grad skip and
clipping live inside the optimizer (training/optim.py), so the whole update
is a single device computation with no host sync.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from spfsplatv2_tpu.geometry import se3
from spfsplatv2_tpu.losses.lpips import lpips_loss
from spfsplatv2_tpu.losses.mse import mse_loss
from spfsplatv2_tpu.losses.reproj import ReprojConfig, reproj_loss
from spfsplatv2_tpu.losses.point import regr3d_loss
from spfsplatv2_tpu.models.decoder import DecoderConfig, decode_splatting


@dataclass(frozen=True)
class LossConfig:
    mse_weight: float = 1.0
    lpips_weight: float = 0.05
    lpips_apply_after_step: int = 0
    reproj: ReprojConfig = field(default_factory=ReprojConfig)
    use_lpips: bool = True
    # Path to a torch `lpips.LPIPS(net='vgg')` state dict for canonical
    # weights; None -> deterministic random VGG (see losses/lpips.py).
    lpips_weights_path: Optional[str] = None


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any


def psnr(prediction: jax.Array, target: jax.Array) -> jax.Array:
    mse = jnp.mean((prediction - target) ** 2, axis=(-1, -2, -3))
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


def compute_losses(
    encoder,
    params,
    batch: dict,
    global_step,
    image_shape: tuple[int, int],
    decoder_cfg: DecoderConfig,
    loss_cfg: LossConfig,
    lpips_params=None,
    training_context: bool = False,
    distiller=None,
    distiller_params=None,
):
    """Forward + all training losses. Returns (total_loss, metrics dict)."""
    ctx, tgt = batch["context"], batch["target"]
    v_cxt = ctx["image"].shape[1]

    # Optional shape-stable random view dropout masks ((v,) each): dropped
    # views keep their array slots but are excluded from attention, render
    # opacity, and every loss term (replaces the reference's shape-changing
    # slicing, model_wrapper.py:91-116).
    ctx_valid = batch.get("context_valid")
    tgt_valid = batch.get("target_valid")

    enc_kwargs = {}
    if ctx_valid is not None or tgt_valid is not None:
        enc_kwargs = dict(context_valid=ctx_valid, target_valid=tgt_valid)
    enc_out = encoder.apply(
        params,
        ctx["image"], ctx["intrinsics"], tgt["image"], tgt["intrinsics"],
        global_step=global_step, **enc_kwargs,
    )

    if enc_out["extrinsics_cwt"] is not None:
        extrinsics_all = enc_out["extrinsics_cwt"]
        target_extrinsics = extrinsics_all[:, v_cxt:]
        context_extrinsics = extrinsics_all[:, :v_cxt]
    else:
        target_extrinsics = tgt["extrinsics"]
        context_extrinsics = ctx["extrinsics"]

    if training_context:
        render_extr = jnp.concatenate([context_extrinsics, target_extrinsics], 1)
        render_intr = jnp.concatenate([ctx["intrinsics"], tgt["intrinsics"]], 1)
        near = jnp.concatenate([ctx["near"], tgt["near"]], 1)
        far = jnp.concatenate([ctx["far"], tgt["far"]], 1)
        target_gt = jnp.concatenate([ctx["image"], tgt["image"]], 1)
    else:
        render_extr, render_intr = target_extrinsics, tgt["intrinsics"]
        near, far, target_gt = tgt["near"], tgt["far"], tgt["image"]

    dec_out = decode_splatting(
        enc_out["gaussians"], render_extr, render_intr, near, far,
        image_shape, decoder_cfg,
    )

    b, v = target_gt.shape[:2]
    pred_flat = dec_out.color.reshape(b * v, *dec_out.color.shape[2:])
    gt_flat = target_gt.reshape(b * v, *target_gt.shape[2:])

    # Per-rendered-image weights from the target dropout mask (renders for
    # dropped targets still execute — static shapes — but carry no loss).
    img_w = None
    if tgt_valid is not None and not training_context:
        img_w = jnp.tile(tgt_valid.astype(pred_flat.dtype), b)
    elif tgt_valid is not None and training_context:
        cv = (jnp.ones((v_cxt,), pred_flat.dtype) if ctx_valid is None
              else ctx_valid.astype(pred_flat.dtype))
        img_w = jnp.tile(
            jnp.concatenate([cv, tgt_valid.astype(pred_flat.dtype)]), b
        )

    metrics = {}
    if dec_out.dropped_entries is not None:
        # Entry-budget overflow renders truncated/black tiles into the loss
        # with no visual trace — keep it observable (VERDICT r2 weak #7).
        metrics["raster/dropped_entries"] = jnp.sum(dec_out.dropped_entries)
    if img_w is None:
        total = mse_loss(pred_flat, gt_flat, loss_cfg.mse_weight)
    else:
        per_img = jnp.mean((pred_flat - gt_flat) ** 2, axis=(1, 2, 3))
        total = loss_cfg.mse_weight * (
            jnp.sum(per_img * img_w) / jnp.maximum(jnp.sum(img_w), 1.0)
        )
    metrics["loss/mse"] = total

    if loss_cfg.use_lpips and lpips_params is not None:
        if img_w is None:
            lp = lpips_loss(
                lpips_params, pred_flat, gt_flat, loss_cfg.lpips_weight
            )
        else:
            from spfsplatv2_tpu.losses.lpips import lpips_distances

            d = lpips_distances(lpips_params, pred_flat, gt_flat)
            lp = loss_cfg.lpips_weight * (
                jnp.sum(d * img_w) / jnp.maximum(jnp.sum(img_w), 1.0)
            )
        if loss_cfg.lpips_apply_after_step > 0:
            lp = jnp.where(
                global_step >= loss_cfg.lpips_apply_after_step, lp, 0.0
            )
        metrics["loss/lpips"] = lp
        total = total + lp

    # Reprojection consistency on predicted context poses
    # (reference model_wrapper.py:280-319).
    if enc_out["extrinsics_cwt"] is not None:
        pts3d = enc_out["pts3d"]
        c1 = reproj_loss(
            pts3d[:, 0], context_extrinsics[:, 0], ctx["intrinsics"][:, 0],
            global_step, loss_cfg.reproj,
        )
        n_kept = (
            jnp.asarray(float(v_cxt))
            if ctx_valid is None
            else jnp.maximum(jnp.sum(ctx_valid.astype(jnp.float32)), 1.0)
        )
        c2 = 0.0
        for i in range(1, v_cxt):
            term = reproj_loss(
                pts3d[:, i], context_extrinsics[:, i], ctx["intrinsics"][:, i],
                global_step, loss_cfg.reproj,
            )
            if ctx_valid is not None:
                term = term * ctx_valid[i].astype(term.dtype)
            c2 = c2 + term
        c2 = c2 / n_kept
        metrics["loss/reproj_c1"] = c1
        metrics["loss/reproj_c2"] = c2
        total = total + c1 + c2
        # v1 extra term: pose-only (detached pts3d) reprojection against the
        # CONTEXT-ONLY decoder pass's poses (reference
        # model_wrapper.py:284-304, spfsplat branch).
        if (
            enc_out.get("variant") == "spfsplat"
            and enc_out.get("extrinsics_c") is not None
        ):
            c2_only = 0.0
            for i in range(1, v_cxt):
                term = reproj_loss(
                    pts3d[:, i], enc_out["extrinsics_c"][:, i],
                    ctx["intrinsics"][:, i], global_step, loss_cfg.reproj,
                    detach_pts3d=True,
                )
                if ctx_valid is not None:
                    term = term * ctx_valid[i].astype(term.dtype)
                c2_only = c2_only + term
            c2_only = c2_only / n_kept
            metrics["loss/reproj_c2_only"] = c2_only
            total = total + c2_only

    # Pointmap distillation against the frozen DUSt3R teacher for the first
    # `distill_max_steps` steps (reference model_wrapper.py:322-331).  The
    # caller compiles separate with/without-distiller step functions and
    # switches host-side, so no dead teacher forward runs after the cutoff.
    if distiller is not None and distiller_params is not None:
        pseudo = jax.lax.stop_gradient(
            distiller.apply(distiller_params, ctx["image"][:, :2])
        )
        pts_student = enc_out["pts3d"]
        distill = 0.1 * regr3d_loss(
            pseudo["pts3d"][:, 0], pseudo["pts3d"][:, 1],
            pts_student[:, 0].reshape(*pseudo["pts3d"][:, 0].shape),
            pts_student[:, 1].reshape(*pseudo["pts3d"][:, 1].shape),
            pseudo["conf"][:, 0], pseudo["conf"][:, 1],
        )
        metrics["loss/distillation"] = distill
        total = total + distill

    # Pose-error telemetry vs GT (not a loss).
    if enc_out["extrinsics_cwt"] is not None:
        if "extrinsics" in ctx:
            rot_err = se3.rotation_angle_deg(
                context_extrinsics[:, v_cxt - 1, :3, :3],
                ctx["extrinsics"][:, v_cxt - 1, :3, :3],
            )
            tr_err = se3.translation_angle_deg(
                context_extrinsics[:, v_cxt - 1, :3, 3],
                ctx["extrinsics"][:, v_cxt - 1, :3, 3],
            )
            metrics["pose/context_rot_deg"] = jnp.mean(rot_err)
            metrics["pose/context_transl_deg"] = jnp.mean(tr_err)

    metrics["loss/total"] = total
    metrics["train/psnr"] = jnp.mean(psnr(pred_flat, gt_flat))
    return total, metrics


def make_train_step(
    encoder,
    optimizer: optax.GradientTransformation,
    image_shape: tuple[int, int],
    decoder_cfg: DecoderConfig = DecoderConfig(),
    loss_cfg: LossConfig = LossConfig(),
    lpips_params=None,
    training_context: bool = False,
    donate: bool = True,
    distiller=None,
    distiller_params=None,
    microbatch: int | None = None,
    mesh=None,
):
    """Build the jitted train step: (state, batch) -> (state, metrics).

    `microbatch`: gradient accumulation — the batch is split into equal
    chunks of this size, gradients are averaged over a `lax.scan` of
    per-chunk backward passes, and ONE optimizer update is applied.
    Numerically equivalent to the full batch (equal chunks -> mean of
    means) with activation memory scaled by microbatch/batch: the
    reference trains its b=16 flagship recipe on 80 GB A100s
    (config/experiment/spfsplatv2/re10k.yaml:38-52); one v5e chip has
    16 GB, so b=16 runs as e.g. 4x4 accumulation.

    The returned function carries a `trace_count` list whose length is the
    number of RETRACES — the shape-stability signal for masked view
    dropout (XLA compile counts can be distorted by the persistent
    compilation cache, so tests assert on traces instead).
    """
    trace_count: list[int] = []

    # The frozen LPIPS/teacher weights are JIT ARGUMENTS, not closure
    # captures: closed-over arrays become HLO constants, and ~60 MB of
    # embedded VGG16 weights deterministically SIGSEGVs the TPU
    # remote-compile helper at flagship batch (the round-2/3 train-bench
    # HTTP 500; see .claude/skills/verify/SKILL.md round-3 finding).
    def grad_and_metrics(state: TrainState, batch: dict, lpips_p,
                         distiller_p):
        """Per-shard gradient + metrics (the data-parallel unit)."""

        def loss_fn(params, mb):
            return compute_losses(
                encoder, params, mb, state.step, image_shape,
                decoder_cfg, loss_cfg, lpips_p, training_context,
                distiller, distiller_p,
            )

        b = batch["context"]["image"].shape[0]
        if microbatch is None or microbatch >= b:
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, batch)
        else:
            assert b % microbatch == 0, (b, microbatch)
            n = b // microbatch

            def split(x):
                return x.reshape(n, microbatch, *x.shape[1:])

            stacked = {
                side: jax.tree.map(split, batch[side])
                for side in ("context", "target")
            }
            aux = {
                k: batch[k]
                for k in ("context_valid", "target_valid")
                if k in batch
            }

            def scan_body(carry, mb_sides):
                acc_grads, acc_metrics = carry
                (_, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params, {**mb_sides, **aux})
                acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
                acc_metrics = jax.tree.map(jnp.add, acc_metrics, metrics)
                return (acc_grads, acc_metrics), None

            first_mb = {
                side: jax.tree.map(lambda x: x[0], stacked[side])
                for side in stacked
            }
            metric_shapes = jax.eval_shape(
                lambda p: loss_fn(p, {**first_mb, **aux})[1], state.params
            )
            zero = (
                jax.tree.map(jnp.zeros_like, state.params),
                jax.tree.map(
                    lambda s: jnp.zeros(s.shape, s.dtype), metric_shapes
                ),
            )
            (grads, metrics), _ = jax.lax.scan(scan_body, zero, stacked)
            inv = 1.0 / n
            grads = jax.tree.map(lambda gr: gr * inv, grads)
            # Float metrics (losses/psnr/pose errors) are means -> average;
            # integer counters (raster/dropped_entries) stay batch totals.
            metrics = {
                k: v * inv if jnp.issubdtype(v.dtype, jnp.floating) else v
                for k, v in metrics.items()
            }
        return grads, metrics

    def apply_update(state: TrainState, grads, metrics):
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        metrics["grad/max"] = opt_state.last_max_grad
        metrics["grad/skipped_steps"] = opt_state.skipped_count
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            metrics,
        )

    if mesh is None or getattr(mesh, "size", 1) <= 1:
        def step_fn(state, batch, lpips_p, distiller_p):
            trace_count.append(1)
            grads, metrics = grad_and_metrics(state, batch, lpips_p,
                                              distiller_p)
            return apply_update(state, grads, metrics)
    else:
        # Data-parallel over mesh axis "data" via shard_map: GSPMD cannot
        # auto-partition Mosaic (Pallas) kernels, so the per-shard step
        # body — including the rasterizer and segscan kernels — runs
        # UNPARTITIONED per device and the gradient all-reduce is an
        # explicit pmean over ICI (the TPU-native DDP; reference trains
        # with Lightning DDP/NCCL, src/main.py:135-154).  The optimizer
        # update runs replicated outside the shard_map.
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        def per_shard(state, batch, lpips_p, distiller_p):
            grads, metrics = grad_and_metrics(state, batch, lpips_p,
                                              distiller_p)
            grads = jax.lax.pmean(grads, "data")
            metrics = {
                k: jax.lax.pmean(v, "data")
                if jnp.issubdtype(v.dtype, jnp.floating)
                else jax.lax.psum(v, "data")
                for k, v in metrics.items()
            }
            return grads, metrics

        def step_fn(state, batch, lpips_p, distiller_p):
            trace_count.append(1)
            # Per-leaf specs: batch arrays shard on the leading axis;
            # the optional (v,)-shaped view-validity masks replicate.
            batch_spec = {
                k: (P() if k.endswith("_valid")
                    else jax.tree.map(lambda _: P("data"), v))
                for k, v in batch.items()
            }
            sharded_grads = shard_map(
                per_shard, mesh=mesh,
                in_specs=(P(), batch_spec, P(), P()),
                out_specs=P(),
                check_rep=False,
            )
            grads, metrics = sharded_grads(state, batch, lpips_p,
                                           distiller_p)
            return apply_update(state, grads, metrics)

    jitted_raw = jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    def jitted(state, batch):
        return jitted_raw(state, batch, lpips_params, distiller_params)

    jitted.trace_count = trace_count
    jitted.lower = lambda state, batch: jitted_raw.lower(
        state, batch, lpips_params, distiller_params
    )

    def compile_checked(state, batch):
        """AOT-compile and return (step_callable, peak_hbm_gb | None).

        The callable executes the AOT executable DIRECTLY — re-tracing
        through the jit wrapper was observed to produce a different
        persistent-cache key than lowered.compile(), i.e. a silent
        duplicate ~400 s compile at flagship scale (PERFORMANCE.md).
        peak_hbm_gb comes from XLA's own memory_analysis; "it compiled"
        does NOT mean "it fits" on the axon runtime, which silently pages
        to host at ~10x step cost instead of OOMing.
        """
        compiled = jitted.lower(state, batch).compile()
        peak_gb = peak_hbm_gb(compiled)

        def run(state, batch):
            return compiled(state, batch, lpips_params, distiller_params)

        run.trace_count = trace_count
        return run, peak_gb

    jitted.compile_checked = compile_checked
    return jitted


def peak_hbm_gb(compiled) -> float | None:
    """Peak device-memory estimate (GB) of an AOT-compiled executable."""
    try:
        ma = compiled.memory_analysis()
    except Exception:  # noqa: BLE001 - backend-dependent API
        return None
    if isinstance(ma, list):
        ma = ma[0] if ma else None
    try:
        return (
            ma.argument_size_in_bytes + ma.output_size_in_bytes
            - ma.alias_size_in_bytes + ma.temp_size_in_bytes
        ) / 2**30
    except AttributeError:
        return None


def device_hbm_budget_gb() -> float | None:
    """Usable HBM of device 0, or None when undetectable (e.g. CPU)."""
    dev = jax.devices()[0]
    try:
        stats = dev.memory_stats()
        if stats and "bytes_limit" in stats:
            return stats["bytes_limit"] / 2**30
    except Exception:  # noqa: BLE001 - memory_stats is optional API
        pass
    if getattr(dev, "platform", "") == "tpu":
        return 16.0  # v5e default; override via TrainerConfig.hbm_budget_gb
    return None


class HBMBudgetError(RuntimeError):
    """Compiled step's peak HBM exceeds the device budget (would page)."""


def init_train_state(encoder, optimizer, params) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
    )
