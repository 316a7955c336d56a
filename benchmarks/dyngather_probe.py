"""Probe tpu.dynamic_gather (lane form) speed + correctness in a kernel.

Mosaic lowers `jnp.take_along_axis(x (F, G), idx (F, G), axis=1)` to
tpu.dynamic_gather — a whole-array lane gather.  If this runs vectorized
(>> 1 elem/cycle) the rasterizer can gather entry attributes from a
VMEM-resident per-gaussian table in-kernel, deleting the XLA align/gather
stage (~1 elem/ns measured) from the hot path.

Per-launch the kernel chains K gathers (output feeds the next index), so
per-gather cost = slope between K1 and K2 launches; unique host inputs per
launch defeat any tunnel caching.

Run: timeout 1400 env PYTHONPATH=/root/repo:/root/.axon_site \
  python -u benchmarks/dyngather_probe.py > /tmp/dyng.log 2>&1
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gather_chain_kernel(table_ref, idx_ref, out_ref, *, k, g):
    table = table_ref[...]
    idx = idx_ref[...]
    acc = jnp.zeros_like(table)

    def body(i, carry):
        idx, acc = carry
        out = jnp.take_along_axis(table, idx, axis=1)
        acc = acc + out
        # derive the next index pattern from the gathered DATA (true chain)
        idx = jnp.abs(out.astype(jnp.int32) + idx + i) % g
        return idx, acc

    idx, acc = jax.lax.fori_loop(0, k, body, (idx, acc))
    out_ref[...] = acc + idx.astype(jnp.float32) * 1e-9


def run_chain(table, idx, k):
    f, g = table.shape
    return pl.pallas_call(
        functools.partial(gather_chain_kernel, k=k, g=g),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f, g), jnp.float32),
    )(table, idx)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    # ---- correctness at small G (one gather, no chain)
    def one_gather(table, idx):
        def kern(t_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=1)

        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(table.shape, jnp.float32),
        )(table, idx)

    for g_test in (256, 8192, 131072):
        t = rng.normal(size=(8, g_test)).astype(np.float32)
        ix = rng.integers(0, g_test, (8, g_test)).astype(np.int32)
        try:
            out = jax.jit(one_gather)(jnp.asarray(t), jnp.asarray(ix))
            ok = bool(np.allclose(np.asarray(out),
                                  np.take_along_axis(t, ix, axis=1)))
            print(f"correct g={g_test}: {ok}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"correct g={g_test}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
            return

    # ---- speed at the real size: F=8, G=131072 (1M elements per gather)
    f, g = 8, 131072
    jit_chain = jax.jit(run_chain, static_argnums=2)

    def timed(k, n_launch=4):
        tabs = [jnp.asarray(rng.normal(size=(f, g)).astype(np.float32))
                for _ in range(n_launch)]
        ixs = [jnp.asarray(rng.integers(0, g, (f, g)).astype(np.int32))
               for _ in range(n_launch)]
        out = jit_chain(tabs[0], ixs[0], k)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        s = jnp.zeros((), jnp.float32)
        for i in range(n_launch):
            s = s + jnp.sum(jit_chain(tabs[i], ixs[i], k)[:, :8])
        _ = float(s)
        return (time.perf_counter() - t0) / n_launch * 1e3

    t16a = timed(16)
    t64a = timed(64)
    t16b = timed(16)
    t64b = timed(64)
    per = ((t64a + t64b) - (t16a + t16b)) / 2 / 48
    elems = f * g
    print(f"K=16: {t16a:.3f}/{t16b:.3f} ms  K=64: {t64a:.3f}/{t64b:.3f} ms",
          flush=True)
    print(f"per-gather ({elems/1e6:.1f}M elem): {per:.4f} ms  "
          f"-> {elems / max(per, 1e-9) / 1e6:.0f}M elem/ms", flush=True)


if __name__ == "__main__":
    main()
