"""Novel-view trajectory videos from predicted Gaussians.

TPU-native port of the reference's validation video renderers
(reference: src/model/model_wrapper.py:805-985 render_video_wobble /
render_video_interpolation / render_video_interpolation_exaggerated /
render_video_generic): re-run the encoder without target views, generate a
camera trajectory from the predicted context poses, render N frames with
the differentiable rasterizer, and write a video file.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable

import jax.numpy as jnp
import numpy as np

from spfsplatv2_tpu.models.decoder import DecoderConfig, decode_splatting
from spfsplatv2_tpu.utils.camera_trajectory import (
    generate_wobble,
    generate_wobble_transformation,
    interpolate_extrinsics,
    interpolate_intrinsics,
)
from spfsplatv2_tpu.utils.visualization import save_video

# trajectory_fn(t, context_extrinsics (v, 4, 4), context_intrinsics
# (v, 3, 3)) -> (extrinsics (n, 4, 4), intrinsics (n, 3, 3))
TrajectoryFn = Callable[[np.ndarray, np.ndarray, np.ndarray],
                        tuple[np.ndarray, np.ndarray]]


def render_trajectory_video(
    encoder,
    params,
    context: dict,
    image_shape: tuple[int, int],
    trajectory_fn: TrajectoryFn,
    num_frames: int = 30,
    smooth: bool = True,
    loop_reverse: bool = True,
    decoder_cfg: DecoderConfig = DecoderConfig(),
    output_path: str | Path | None = None,
    fps: int = 30,
) -> np.ndarray:
    """Generic trajectory renderer (reference render_video_generic,
    model_wrapper.py:908-985).  context: single-example dict (v, ...)
    arrays.  Returns (n, h, w, 3) frames."""
    ctx_img = jnp.asarray(context["image"])[None]
    ctx_k = jnp.asarray(context["intrinsics"])[None]
    out = encoder.apply(params, ctx_img, ctx_k)

    poses = np.asarray(out["extrinsics_c"][0])
    t = np.linspace(0, 1, num_frames, dtype=np.float32)
    if smooth:
        t = (np.cos(np.pi * (t + 1)) + 1) / 2
    trajectory, intr = trajectory_fn(t, poses, np.asarray(ctx_k[0]))

    v = trajectory.shape[0]
    near = jnp.full((1, v), float(np.asarray(context["near"]).reshape(-1)[0]))
    far = jnp.full((1, v), float(np.asarray(context["far"]).reshape(-1)[0]))
    rendered = decode_splatting(
        out["gaussians"], jnp.asarray(trajectory)[None],
        jnp.asarray(intr)[None], near, far, image_shape, decoder_cfg,
    )
    frames = np.asarray(jnp.clip(rendered.color[0], 0.0, 1.0))
    if loop_reverse:
        frames = np.concatenate([frames, frames[::-1][1:-1]], axis=0)
    if output_path is not None:
        save_video(list(frames), output_path, fps=fps)
    return frames


def render_interpolation_video(
    encoder,
    params,
    context: dict,
    image_shape: tuple[int, int],
    num_frames: int = 60,
    decoder_cfg: DecoderConfig = DecoderConfig(),
    output_path: str | Path | None = None,
    fps: int = 30,
) -> np.ndarray:
    """Smooth there-and-back interpolation between the outer context poses
    (reference render_video_interpolation, model_wrapper.py:843-865)."""

    def trajectory(t, poses, intrinsics):
        extr = interpolate_extrinsics(poses[0], poses[-1], t)
        intr = interpolate_intrinsics(intrinsics[0], intrinsics[-1], t)
        return extr, intr

    return render_trajectory_video(
        encoder, params, context, image_shape, trajectory,
        num_frames=num_frames, smooth=True, loop_reverse=True,
        decoder_cfg=decoder_cfg, output_path=output_path, fps=fps,
    )


def render_wobble_video(
    encoder,
    params,
    context: dict,
    image_shape: tuple[int, int],
    num_frames: int = 60,
    decoder_cfg: DecoderConfig = DecoderConfig(),
    output_path: str | Path | None = None,
    fps: int = 30,
) -> np.ndarray:
    """Wobble about context view 0 with radius = 0.25x the context
    separation (reference render_video_wobble, model_wrapper.py:812-838)."""

    def trajectory(t, poses, intrinsics):
        delta = float(np.linalg.norm(poses[0, :3, 3] - poses[-1, :3, 3]))
        extr = generate_wobble(poses[0], delta * 0.25, t)
        intr = np.broadcast_to(intrinsics[0], (t.shape[0], 3, 3))
        return extr, intr

    return render_trajectory_video(
        encoder, params, context, image_shape, trajectory,
        num_frames=num_frames, smooth=True, loop_reverse=True,
        decoder_cfg=decoder_cfg, output_path=output_path, fps=fps,
    )


def render_exaggerated_interpolation_video(
    encoder,
    params,
    context: dict,
    image_shape: tuple[int, int],
    num_frames: int = 300,
    decoder_cfg: DecoderConfig = DecoderConfig(),
    output_path: str | Path | None = None,
    fps: int = 30,
) -> np.ndarray:
    """Extrapolated interpolation overlaid with a 5-turn wobble (reference
    render_video_interpolation_exaggerated, model_wrapper.py:867-906)."""

    def trajectory(t, poses, intrinsics):
        delta = float(np.linalg.norm(poses[0, :3, 3] - poses[-1, :3, 3]))
        tf = generate_wobble_transformation(
            delta * 0.5, t, 5, scale_radius_with_t=False
        )
        extr = interpolate_extrinsics(poses[0], poses[-1], t * 5 - 2)
        intr = interpolate_intrinsics(
            intrinsics[0], intrinsics[-1], t * 5 - 2
        )
        return extr @ tf, intr

    return render_trajectory_video(
        encoder, params, context, image_shape, trajectory,
        num_frames=num_frames, smooth=False, loop_reverse=False,
        decoder_cfg=decoder_cfg, output_path=output_path, fps=fps,
    )
