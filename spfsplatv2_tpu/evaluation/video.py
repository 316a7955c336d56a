"""Novel-view interpolation videos from predicted Gaussians.

TPU-native port of the reference's validation video renderer
(reference: src/model/model_wrapper.py:811-985 render_video_interpolation /
render_video_generic): re-run the encoder without target views, interpolate
between the predicted context poses (SE(3)-smooth), render N frames with the
differentiable rasterizer, and write a video file.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from spfsplatv2_tpu.models.decoder import DecoderConfig, decode_splatting
from spfsplatv2_tpu.utils.visualization import interpolate_extrinsics, save_video


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
    """context: single-example dict (v, ...) arrays. Returns (n, h, w, 3)."""
    ctx_img = jnp.asarray(context["image"])[None]
    ctx_k = jnp.asarray(context["intrinsics"])[None]
    out = encoder.apply(params, ctx_img, ctx_k)

    poses = np.asarray(out["extrinsics_c"][0])
    # Smooth there-and-back trajectory between the two outer context poses.
    t = (np.cos(np.linspace(0, 2 * np.pi, num_frames)) * -0.5 + 0.5)
    trajectory = interpolate_extrinsics(poses[0], poses[-1], t)

    v = trajectory.shape[0]
    k = jnp.broadcast_to(ctx_k[:, :1], (1, v, 3, 3))
    near = jnp.full((1, v), float(context["near"][0]))
    far = jnp.full((1, v), float(context["far"][0]))
    rendered = decode_splatting(
        out["gaussians"], jnp.asarray(trajectory)[None], k, near, far,
        image_shape, decoder_cfg,
    )
    frames = np.asarray(jnp.clip(rendered.color[0], 0.0, 1.0))
    if output_path is not None:
        save_video(list(frames), output_path, fps=fps)
    return frames
