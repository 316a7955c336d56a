"""Probe: in-kernel gathers + TRUE XLA gather/scatter rates (dedup-proof).

Timing on this tunnel backend is only trustworthy when (a) every timed call
has NOVEL inputs (identical repeated executions can be served ~free), and
(b) the per-call device time is multi-ms.  Here each variant runs over K
pre-staged distinct input sets, twice, and prints both passes — agreement
across passes is the sanity signal.

Decision this probe feeds: can the rasterizer keep the packed per-gaussian
table (131k x 16 f32 = 8.4 MB) VMEM-resident and gather entries in-kernel,
deleting the XLA align/gather stage (~6.9 ms/cam) and its scatter-add VJP?

Run on the real chip:
  timeout 1400 env PYTHONPATH=/root/repo:/root/.axon_site \
    python -u benchmarks/kernel_gather_probe.py > /tmp/kgp3.log 2>&1
"""

from __future__ import annotations

import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 131072        # table rows (gaussians)
FEAT = 16
CHUNK = 256       # entries gathered per grid step
STEPS = 1024      # total chunks (= 262k entries, ~one camera fwd)
K = 8             # distinct input sets per timing pass


def measure(fn, tables, idxs, iters=K):
    """Each call gets a distinct (table, idx); checksum fetch forces work."""
    out = fn(tables[0], idxs[0])
    jax.block_until_ready(out)
    acc = jnp.zeros((), jnp.float32)

    def one_pass():
        nonlocal acc
        t0 = time.perf_counter()
        outs = [fn(tables[i % K], idxs[i % K]) for i in range(1, iters + 1)]
        s = sum(jnp.sum(o[..., :1].astype(jnp.float32)) for o in outs)
        _ = float(s)  # host fetch: cannot complete without real execution
        return (time.perf_counter() - t0) / iters * 1e3

    return one_pass(), one_pass()


def make_inputs():
    rng = np.random.default_rng(0)
    tables = [
        jnp.asarray(rng.normal(size=(N, FEAT)).astype(np.float32))
        for _ in range(K)
    ]
    idxs = [
        jnp.asarray(rng.integers(0, N, (STEPS, CHUNK)).astype(np.int32))
        for _ in range(K)
    ]
    return tables, idxs


# ---------------- XLA baselines (calibrate the element-rate model)

def xla_row16(table, idx):
    return table[idx.reshape(-1)]                 # 4.2M elements


def xla_row8(table, idx):
    return table[:, :8][idx.reshape(-1)]          # 2.1M elements


def xla_row8_bitcast(table, idx):
    # 16 bf16 fields packed as 8 f32 slots: same bytes as row16/bf16.
    t8 = jax.lax.bitcast_convert_type(
        table.astype(jnp.bfloat16).reshape(N, 8, 2), jnp.float32
    )
    return t8[idx.reshape(-1)]                    # 2.1M elements


def xla_scatter16(table, idx):
    upd = jnp.broadcast_to(
        table[: STEPS * CHUNK // 2].reshape(-1, FEAT)[: STEPS * CHUNK // 2],
        (STEPS * CHUNK // 2, FEAT),
    )
    return jnp.zeros((N, FEAT), jnp.float32).at[
        idx.reshape(-1)[: STEPS * CHUNK // 2]
    ].add(upd)                                    # 2.1M elements scattered


# ---------------- in-kernel variants

def k_rows_take(table, idx):
    """VMEM table; jnp.take along axis 0 (sublanes) per chunk."""

    def kernel(idx_ref, table_ref, out_ref):
        i = pl.program_id(0)
        ids = idx_ref[i, :]
        out_ref[...] = jnp.take(table_ref[...], ids, axis=0)[None]

    return pl.pallas_call(
        kernel,
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, CHUNK, FEAT), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((STEPS, CHUNK, FEAT), jnp.float32),
    )(idx, table)


def k_lanes_take(table, idx):
    """Transposed VMEM table (FEAT, N): gather along the LANE axis."""

    def kernel(idx_ref, table_ref, out_ref):
        i = pl.program_id(0)
        ids = jnp.broadcast_to(idx_ref[i, :][None, :], (FEAT, CHUNK))
        out_ref[...] = jnp.take_along_axis(table_ref[...], ids, axis=1)[None]

    def run(t, ix):
        return pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, FEAT, CHUNK), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((STEPS, FEAT, CHUNK), jnp.float32),
        )(ix, t.T)

    return run(table, idx)


def k_dyn_window(table, idx):
    """No gather: dynamic chunk-aligned window DMA from an HBM stream.

    Tests the live-prefix design: kernel reads attrs_sorted directly at a
    DYNAMIC (SMEM-scalar-derived, floor-aligned) offset instead of
    fixed-stride program-id arithmetic.
    """
    stream = table[idx[0] % N].T                  # (FEAT, CHUNK) dummy source
    stream = jnp.tile(stream, (1, STEPS))         # (FEAT, STEPS*CHUNK)
    starts = (jnp.cumsum(idx[:, 0] % 7) * 0 +
              jnp.arange(STEPS, dtype=jnp.int32) * CHUNK)

    def kernel(starts_ref, stream_ref, out_ref, scratch, sem):
        i = pl.program_id(0)
        raw = starts_ref[i]
        aligned = (raw // 128) * 128
        off = pl.multiple_of(aligned, 128)
        cp = pltpu.make_async_copy(
            stream_ref.at[:, pl.ds(off, CHUNK)], scratch, sem
        )
        cp.start()
        cp.wait()
        out_ref[...] = scratch[...][None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(STEPS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, FEAT, CHUNK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((FEAT, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((STEPS, FEAT, CHUNK), jnp.float32),
    )(starts, stream)


def main():
    print("backend:", jax.default_backend(), flush=True)
    tables, idxs = make_inputs()

    ref = np.asarray(tables[0])[np.asarray(idxs[0]).reshape(-1)]

    for name, fn, check in [
        ("xla_row16 (4.2M elem)", xla_row16, "row16"),
        ("xla_row8  (2.1M elem)", xla_row8, None),
        ("xla_row8_bitcast", xla_row8_bitcast, None),
        ("xla_scatter16 (2.1M)", xla_scatter16, None),
        ("k_rows_take", k_rows_take, "rows3d"),
        ("k_lanes_take", k_lanes_take, "lanes3d"),
        ("k_dyn_window", k_dyn_window, None),
    ]:
        try:
            j = jax.jit(fn)
            out = j(tables[0], idxs[0])
            jax.block_until_ready(out)
            ok = "-"
            if check == "row16":
                ok = bool(np.allclose(np.asarray(out), ref))
            elif check == "rows3d":
                ok = bool(np.allclose(
                    np.asarray(out).reshape(-1, FEAT), ref))
            elif check == "lanes3d":
                o = np.swapaxes(np.asarray(out), 1, 2).reshape(-1, FEAT)
                ok = bool(np.allclose(o, ref))
            m1, m2 = measure(j, tables, idxs)
            print(f"{name:24s}: {m1:8.3f} / {m2:8.3f} ms  correct={ok}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:140]
            print(f"{name:24s}: FAILED {type(e).__name__}: {msg}", flush=True)
            if "Mosaic" in str(e) or isinstance(e, (TypeError, ValueError)):
                tb = traceback.format_exc().splitlines()
                print("   " + "\n   ".join(tb[-6:]), flush=True)


if __name__ == "__main__":
    main()
