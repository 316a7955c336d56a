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


_DTYPE_BYTES = {
    "pred": 0.125, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2,
    "f16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}


def _shape_bytes(shape_str: str) -> int:
    """Bytes of one HLO shape literal like 'f32[128,256]' or 'bf16[64]{0}'."""
    import re

    m = re.match(r"([a-z0-9]+)\[([0-9,]*)\]", shape_str.strip())
    if not m:
        return 0
    dtype, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return int(n * _DTYPE_BYTES.get(dtype, 4))


def audit_collectives(hlo_text: str) -> dict:
    """Parse compiled HLO for communication ops: counts + payload bytes.

    The DDP-equivalent claim for the data-parallel train step is checkable
    from the compiled program alone: gradient all-reduce volume must be
    ~= the f32 parameter byte count (XLA inserts the psum from sharding
    propagation; no hand-written collectives).  Returns per-op-kind
    {count, bytes}.
    """
    import re

    kinds = ("all-reduce", "reduce-scatter", "all-gather",
             "collective-permute", "all-to-all")
    out = {k: {"count": 0, "bytes": 0} for k in kinds}
    # Instruction form: `%name = <shape> all-reduce(...)` or
    # `... = (f32[...], f32[...]) all-reduce-start(...)`.  Tuple types
    # carry layout annotations with nested parens (`{1,0:T(8,128)S(1)}`)
    # and can span MULTIPLE lines in TPU-scheduled dumps (shard_map psum
    # emits one tuple all-reduce over every gradient leaf), so the tuple
    # alternative tolerates one nesting level and newlines.
    pat = re.compile(
        r"=\s*(\((?:[^()]|\([^()]*\))*\)|[a-z0-9]+\[[0-9,]*\][^\s]*)\s+"
        r"(all-reduce|reduce-scatter|all-gather|collective-permute|all-to-all)"
        r"(?:-start)?\(",
        re.DOTALL,
    )
    for m in pat.finditer(hlo_text):
        shapes, kind = m.groups()
        if shapes.startswith("("):
            # Tuple shape: dims contain commas too, so regex the shape
            # literals out instead of splitting on ','.
            total = sum(
                _shape_bytes(s)
                for s in re.findall(r"[a-z0-9]+\[[0-9,]*\]", shapes)
            )
        else:
            total = _shape_bytes(shapes)
        out[kind]["count"] += 1
        out[kind]["bytes"] += total
    return out


def audit_overlap(hlo_text: str) -> dict:
    """Check the gradient all-reduce's SCHEDULING in compiled HLO.

    North star (BASELINE.json): the data-parallel gradient all-reduce
    overlaps the rasterizer backward instead of blocking at the tail.  On
    TPU, XLA's latency-hiding scheduler splits collectives into async
    `all-reduce-start` / `all-reduce-done` pairs and the post-scheduling
    instruction order within a computation IS the execution schedule — so
    overlap is checkable from the text: count the real work (fusions,
    sorts, custom-calls — the rasterizer backward is fusions + sorts +
    the Pallas kernel custom-call) scheduled BETWEEN each start and its
    done.

    CPU lowers collectives synchronously (no async pairs) — the dryrun on
    a host-platform mesh then reports {"mode": "sync-cpu-lowering"} and
    the volume audit (audit_collectives) remains the checkable claim.
    """
    import re

    lines = hlo_text.splitlines()
    starts: dict[str, int] = {}
    overlaps = []
    work_pat = re.compile(r"=\s*[^=]*\b(fusion|sort|custom-call)\(")
    name_pat = re.compile(r"%?([\w.\-]+)\s*=")
    for i, line in enumerate(lines):
        if "all-reduce-start(" in line:
            m = name_pat.search(line)
            if m:
                starts[m.group(1)] = i
        elif "all-reduce-done(" in line:
            arg = re.search(r"all-reduce-done\(\s*%?([\w.\-]+)", line)
            if not arg:
                continue
            start_line = starts.get(arg.group(1))
            if start_line is None:
                continue
            work = sum(
                1
                for j in range(start_line + 1, i)
                if work_pat.search(lines[j])
            )
            overlaps.append(work)
    if not overlaps:
        has_sync = "all-reduce(" in hlo_text
        return {
            # Sync collectives appear both from CPU lowering AND from the
            # TPU scheduler deciding async splitting isn't profitable at
            # small collective sizes — the caller knows which platform.
            "mode": "sync-scheduled" if has_sync else "no-collectives",
            "async_pairs": 0,
        }
    return {
        "mode": "async",
        "async_pairs": len(overlaps),
        # Ops of real work scheduled inside each start..done window; > 0
        # for at least one pair means the all-reduce is overlapped with
        # computation rather than tail-blocking.
        "work_ops_inside_windows": overlaps,
        "overlapped": any(w > 0 for w in overlaps),
    }
