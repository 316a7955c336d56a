"""Core Gaussian container pytree.

TPU-native analog of the reference's `Gaussians` dataclass
(reference: src/model/encoder/common/gaussian_adapter.py:15-23 and
src/model/types.py). A flat batch of 3D Gaussians with world-space means,
covariances, raw scale/rotation (kept for PLY export), SH color coefficients
and opacities. Registered as a JAX pytree so it flows through jit/vmap/grad.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Gaussians:
    """A batch of 3D Gaussians.

    Shapes use `*batch` for arbitrary leading batch dims (typically `(b, g)`).

    Attributes:
      means:        (*batch, 3)        world-space centers.
      covariances:  (*batch, 3, 3)     world-space covariance matrices.
      scales:       (*batch, 3)        per-axis scales (pre-covariance).
      rotations:    (*batch, 4)        unit quaternions (w, x, y, z).
      harmonics:    (*batch, 3, d_sh)  SH coefficients per color channel.
      opacities:    (*batch,)          opacity in [0, 1].
    """

    means: jax.Array
    covariances: jax.Array
    scales: jax.Array
    rotations: jax.Array
    harmonics: jax.Array
    opacities: jax.Array

    @property
    def d_sh(self) -> int:
        return self.harmonics.shape[-1]

    @property
    def sh_degree(self) -> int:
        import math

        return int(math.isqrt(self.d_sh)) - 1

    def flatten_views(self) -> "Gaussians":
        """Merge a (b, v, r, ...) layout into (b, v*r, ...)."""
        def merge(x, trailing):
            lead = x.shape[: x.ndim - trailing]
            tail = x.shape[x.ndim - trailing:]
            return x.reshape(lead[0], -1, *tail)

        return Gaussians(
            means=merge(self.means, 1),
            covariances=merge(self.covariances, 2),
            scales=merge(self.scales, 1),
            rotations=merge(self.rotations, 1),
            harmonics=merge(self.harmonics, 2),
            opacities=merge(self.opacities, 0),
        )

    def astype(self, dtype) -> "Gaussians":
        return jax.tree.map(lambda x: x.astype(dtype), self)


def concatenate(gaussians: list[Gaussians], axis: int = 1) -> Gaussians:
    """Concatenate Gaussian batches along a batch axis."""
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=axis), *gaussians)
