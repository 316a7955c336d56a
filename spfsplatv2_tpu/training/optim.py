"""Optimizer: two-group AdamW + warmup-cosine + clip + bad-gradient skip.

TPU-native equivalent of the reference training optimizer
(reference: src/model/model_wrapper.py:1067-1151):

  * AdamW(betas=(0.9, 0.95), weight_decay=0.05) with newly-initialized heads
    (gaussian_param_head*, intrinsic_encoder, pose_head*, camera_head) at
    `lr` and pretrained backbone params at `lr * backbone_lr_multiplier`,
  * linear warmup (1/warm_up -> 1) then cosine decay to
    `lr * min_lr_multiplier`,
  * global-norm clip 0.5,
  * skip-step on NaN or too-large gradients (the reference's manual
    optimizer_step), implemented as a gradient transform so it stays inside
    the jitted update.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


@dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 1e-4
    warm_up_steps: int = 2000
    max_steps: int = 300_001
    backbone_lr_multiplier: float = 0.1
    min_lr_multiplier: float = 0.01
    weight_decay: float = 0.05
    b1: float = 0.9
    b2: float = 0.95
    grad_clip: float = 0.5
    max_grad_skip: float = 5.0  # 20 for VGGT (reference line 1121)


NEW_PARAM_KEYWORDS = (
    "gaussian_param_head",
    "intrinsic_encoder",
    "pose_head",
    "camera_head",
)

# Keyword freezing (reference model_wrapper.py:83-85,178-184,1050-1065):
# freeze_pretrained keeps ONLY these heads trainable.
FREEZE_UNFREEZE_KEYWORDS = ("gaussian_param_head", "pose_head", "intrinsic_encoder")


@dataclass(frozen=True)
class FreezeConfig:
    """Keyword parameter freezing for fine-tuning recipes.

    Mirrors the reference's sequential `freeze_params` calls
    (model_wrapper.py:178-184): freeze_backbone first, then
    freeze_pretrained (which REWRITES every flag: trainable iff the name
    contains an unfreeze keyword), then freeze_pose_head — so effective
    precedence is pose_head > pretrained > backbone.
    """

    freeze_pretrained: bool = False
    freeze_backbone: bool = False
    freeze_pose_head: bool = False

    @property
    def any(self) -> bool:
        return (
            self.freeze_pretrained or self.freeze_backbone
            or self.freeze_pose_head
        )

    def is_frozen(self, path_str: str) -> bool:
        if self.freeze_pose_head and "pose_head" in path_str:
            return True
        if self.freeze_pretrained:
            return not any(k in path_str for k in FREEZE_UNFREEZE_KEYWORDS)
        return self.freeze_backbone and "backbone" in path_str


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def _param_labels(params, freeze: FreezeConfig = FreezeConfig()) -> dict:
    """'frozen' per FreezeConfig; else 'new' for freshly-initialized heads,
    'pretrained' for the rest."""

    def label(path):
        path_str = _path_str(path)
        if freeze.is_frozen(path_str):
            return "frozen"
        return "new" if any(k in path_str for k in NEW_PARAM_KEYWORDS) else "pretrained"

    return jax.tree_util.tree_map_with_path(lambda p, _: label(p), params)


class SkipState(NamedTuple):
    inner: optax.OptState
    skipped_count: jax.Array
    last_max_grad: jax.Array


def skip_bad_gradients(
    inner: optax.GradientTransformation, max_abs: float, frozen_mask=None
) -> optax.GradientTransformation:
    """Zero the update (and keep inner state unchanged) on NaN/huge grads.

    `frozen_mask` (bool pytree, optional) zeroes frozen subtrees' gradients
    BEFORE the NaN/large-grad check (and before the inner clip), so frozen
    params influence neither — matching the reference, where frozen params
    produce no gradients at all (requires_grad=False)."""

    def init_fn(params):
        return SkipState(
            inner.init(params), jnp.zeros((), jnp.int32), jnp.zeros(())
        )

    def update_fn(updates, state, params=None, **kw):
        if frozen_mask is not None:
            updates = jax.tree.map(
                lambda g, m: jnp.zeros_like(g) if m else g,
                updates, frozen_mask,
            )
        leaves = jax.tree.leaves(updates)
        max_grad = jnp.max(jnp.stack([jnp.max(jnp.abs(g)) for g in leaves]))
        # NaN/Inf anywhere makes max_grad NaN/Inf, so one comparison covers
        # both the non-finite and too-large cases.
        ok = max_grad <= max_abs

        # lax.cond keeps the skip to two branches (apply vs identity) —
        # per-leaf selects over the optimizer state make the XLA CPU
        # compile pathologically slow (minutes) at ViT parameter counts.
        def do_update(operand):
            upd, inner_state = operand
            return inner.update(upd, inner_state, params, **kw)

        def no_update(operand):
            upd, inner_state = operand
            return jax.tree.map(jnp.zeros_like, upd), inner_state

        new_updates, new_inner = jax.lax.cond(
            ok, do_update, no_update, (updates, state.inner)
        )
        return new_updates, SkipState(
            new_inner, state.skipped_count + (1 - ok.astype(jnp.int32)), max_grad
        )

    return optax.GradientTransformation(init_fn, update_fn)


def make_schedule(cfg: OptimizerConfig, multiplier: float = 1.0):
    peak = cfg.lr * multiplier
    return optax.join_schedules(
        [
            optax.linear_schedule(
                peak / cfg.warm_up_steps, peak, cfg.warm_up_steps
            ),
            optax.cosine_decay_schedule(
                peak,
                max(cfg.max_steps - cfg.warm_up_steps, 1),
                alpha=cfg.min_lr_multiplier,
            ),
        ],
        [cfg.warm_up_steps],
    )


def make_optimizer(
    cfg: OptimizerConfig,
    params,
    freeze: FreezeConfig = FreezeConfig(),
) -> optax.GradientTransformation:
    def adamw(multiplier):
        return optax.adamw(
            make_schedule(cfg, multiplier),
            b1=cfg.b1,
            b2=cfg.b2,
            weight_decay=cfg.weight_decay,
        )

    labels = _param_labels(params, freeze)
    transforms = {
        "new": adamw(1.0),
        "pretrained": adamw(cfg.backbone_lr_multiplier),
        # set_to_zero (not a masked adamw) so frozen subtrees see neither
        # updates NOR weight decay, exactly like requires_grad=False.
        "frozen": optax.set_to_zero(),
    }
    inner = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.multi_transform(transforms, labels),
    )
    frozen_mask = (
        jax.tree.map(lambda l: l == "frozen", labels) if freeze.any else None
    )
    return skip_bad_gradients(inner, cfg.max_grad_skip, frozen_mask)
