"""Test-time pose alignment: optimize target extrinsics through the renderer.

TPU-native port of the reference's `test_step_align`
(reference: src/model/model_wrapper.py:539-590): with the encoder frozen,
the predicted target pose is refined by Adam on a photometric loss whose
gradients flow THROUGH the differentiable rasterizer into the camera pose
(the diff_gauss_pose viewmatrix gradient). The pose is parameterized as an
SE(3) tangent delta around the initial prediction, so optimization stays on
the manifold (the reference optimizes the raw 4x4 and relies on the
rasterizer tolerating non-orthonormal view matrices; a tangent-space delta
is strictly better behaved and converges in fewer steps).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from spfsplatv2_tpu.gaussians import Gaussians
from spfsplatv2_tpu.geometry import se3
from spfsplatv2_tpu.models.decoder import DecoderConfig, decode_splatting


@partial(
    jax.jit,
    static_argnames=("image_shape", "steps", "lr", "decoder_cfg"),
)
def align_poses(
    gaussians: Gaussians,        # (b, g, ...)
    init_extrinsics: jax.Array,  # (b, v, 4, 4) predicted target poses
    intrinsics: jax.Array,       # (b, v, 3, 3)
    near: jax.Array,             # (b, v)
    far: jax.Array,              # (b, v)
    target_images: jax.Array,    # (b, v, h, w, 3)
    image_shape: tuple[int, int],
    steps: int = 100,
    lr: float = 5e-4,
    decoder_cfg: DecoderConfig = DecoderConfig(),
):
    """Returns (refined extrinsics (b, v, 4, 4), final loss)."""
    b, v = init_extrinsics.shape[:2]
    delta0 = jnp.zeros((b, v, 6), init_extrinsics.dtype)
    opt = optax.adam(lr)

    def apply_delta(delta):
        return se3.se3_exp(delta) @ init_extrinsics

    def loss_fn(delta):
        out = decode_splatting(
            gaussians, apply_delta(delta), intrinsics, near, far,
            image_shape, decoder_cfg,
        )
        return jnp.mean((out.color - target_images) ** 2)

    def step(carry, _):
        delta, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(delta)
        updates, opt_state = opt.update(grads, opt_state, delta)
        delta = optax.apply_updates(delta, updates)
        return (delta, opt_state), loss

    (delta, _), losses = jax.lax.scan(
        step, (delta0, opt.init(delta0)), None, length=steps
    )
    return apply_delta(delta), losses[-1]
