"""Probe: DMA realign kernel — dynamic MAJOR-dim offsets on (E, 16) rows.

Mosaic's multiple_of(128) proof obligation applies to LANE (minor-dim)
slicing; if dim-0 (row) slices of an (E, 16) HBM array accept arbitrary
dynamic offsets, a per-tile DMA copy kernel can move sorted-order entry
rows into chunk-aligned segments, replacing a ~2.4 ms per-index-bound
gather per direction (see PERFORMANCE.md headroom notes).

Checks: (a) does it compile, (b) is the copy correct, (c) what does it
cost at bench scale (256 tiles, ~200k rows).

Run: timeout 1400 env PYTHONPATH=/root/repo:/root/.axon_site \
  python -u benchmarks/realign_probe.py > /tmp/realign.log 2>&1
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_TILES = 256
FEAT = 16
CHUNK = 256
E_SRC = 262144
E_DST = 262144 + N_TILES * CHUNK


def realign(src_rows, src_starts, dst_starts, counts):
    """Copy rows [src_starts[t], +counts[t]) -> [dst_starts[t], ...)."""

    def kernel(srcs_ref, dsts_ref, cnts_ref, rows_hbm, out_hbm, vscratch,
               sem_in, sem_out):
        t = pl.program_id(0)
        s0 = srcs_ref[t]
        d0 = dsts_ref[t]
        n = cnts_ref[t]
        n_ch = pl.cdiv(n, CHUNK)

        def body(c, _):
            cp_in = pltpu.make_async_copy(
                rows_hbm.at[pl.ds(s0 + c * CHUNK, CHUNK), :],
                vscratch, sem_in)
            cp_in.start()
            cp_in.wait()
            cp_out = pltpu.make_async_copy(
                vscratch, out_hbm.at[pl.ds(d0 + c * CHUNK, CHUNK), :],
                sem_out)
            cp_out.start()
            cp_out.wait()
            return _

        jax.lax.fori_loop(0, n_ch, body, None)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N_TILES,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, FEAT), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((E_DST, FEAT), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(src_starts, dst_starts, counts, src_rows)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(size=(E_SRC, FEAT)).astype(np.float32))

    counts_np = rng.integers(300, 1400, N_TILES).astype(np.int32)
    src_starts_np = np.concatenate([[0], np.cumsum(counts_np)[:-1]]).astype(
        np.int32)
    caps = ((counts_np + CHUNK - 1) // CHUNK) * CHUNK
    dst_starts_np = np.concatenate([[0], np.cumsum(caps)[:-1]]).astype(
        np.int32)
    assert src_starts_np[-1] + counts_np[-1] <= E_SRC
    assert dst_starts_np[-1] + caps[-1] <= E_DST

    src_starts = jnp.asarray(src_starts_np)
    dst_starts = jnp.asarray(dst_starts_np)
    counts = jnp.asarray(counts_np)

    try:
        j = jax.jit(realign)
        out = j(rows, src_starts, dst_starts, counts)
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        print(f"COMPILE/RUN FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}", flush=True)
        return

    out_np = np.asarray(out)
    ok = True
    for t in range(0, N_TILES, 37):
        n = counts_np[t]
        # the copy is chunk-granular; only the first n rows must match
        got = out_np[dst_starts_np[t]:dst_starts_np[t] + n]
        want = np.asarray(rows)[src_starts_np[t]:src_starts_np[t] + n]
        if not np.allclose(got, want):
            ok = False
            print(f"tile {t}: MISMATCH", flush=True)
    print(f"correct={ok}", flush=True)

    def timeit(fn, *args, iters=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    ms = timeit(j, rows, src_starts, dst_starts, counts)
    print(f"realign 256 tiles / ~210k rows x 16: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
