"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's distributed layer (Lightning DDP
over NCCL, reference: src/main.py:135-154): a `jax.sharding.Mesh` with a
`data` axis (scenes/batch) — parameters replicated, batches sharded on the
leading axis, gradient all-reduce inserted automatically by XLA inside the
jitted train step (the psum overlaps with the rasterizer backward under the
XLA scheduler, replacing DDP bucket all-reduce). A `tile` axis is reserved
for within-replica sharding of rasterizer tiles/pixels at high resolution.

Multi-host: call `jax.distributed.initialize()` before building the mesh;
the same code then spans hosts with parameters replicated over ICI/DCN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None, n_tile: int = 1, devices=None
) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // n_tile
    devices = devices[: n_data * n_tile].reshape(n_data, n_tile)
    return Mesh(devices, axis_names=("data", "tile"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    sharding = replicated(mesh)
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh):
    """Shard every leaf of a batch pytree along its leading axis."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
