"""Per-grid-step overhead anatomy: out-block layout and steps-per-launch.

kernel_overhead_probe measured ~5.7 us/step with counts=0 (no loop body).
Variants isolate the cause: lane-padded (P, 8) out blocks vs dense
(8, P), 1 vs 4 tiles per grid step, and a no-output kernel.

Run: timeout 2400 env PYTHONPATH=/root/repo:/root/.axon_site \
  python -u benchmarks/step_overhead_probe.py > /tmp/stepovh.log 2>&1
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_TILES = 256
P = 256


def timeit(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def v_p8(counts):
    def kern(c_ref, o_ref):
        o_ref[...] = jnp.full((1, P, 8), 1.0, jnp.float32)

    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(N_TILES,), in_specs=[],
            out_specs=pl.BlockSpec((1, P, 8), lambda t, c: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((N_TILES, P, 8), jnp.float32),
    )(counts)


def v_8p(counts):
    def kern(c_ref, o_ref):
        o_ref[...] = jnp.full((1, 8, P), 1.0, jnp.float32)

    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(N_TILES,), in_specs=[],
            out_specs=pl.BlockSpec((1, 8, P), lambda t, c: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((N_TILES, 8, P), jnp.float32),
    )(counts)


def v_8p_4x(counts):
    def kern(c_ref, o_ref):
        o_ref[...] = jnp.full((4, 8, P), 1.0, jnp.float32)

    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(N_TILES // 4,), in_specs=[],
            out_specs=pl.BlockSpec((4, 8, P), lambda t, c: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((N_TILES, 8, P), jnp.float32),
    )(counts)


def v_hbm_out(counts):
    """Whole output in HBM; kernel DMAs its (8, P) slice out per step."""
    def kern(c_ref, o_hbm, scratch, sem):
        t = pl.program_id(0)
        scratch[...] = jnp.full((8, P), 1.0, jnp.float32)
        cp = pltpu.make_async_copy(
            scratch, o_hbm.at[:, pl.ds(t * P, P)], sem)
        cp.start()
        cp.wait()

    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(N_TILES,), in_specs=[],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[pltpu.VMEM((8, P), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((8, N_TILES * P), jnp.float32),
    )(counts)


def main():
    print("backend:", jax.default_backend(), flush=True)
    counts = jnp.zeros((N_TILES,), jnp.int32)
    for name, fn in [("out (P,8) padded", v_p8), ("out (8,P) dense", v_8p),
                     ("out (8,P) 4 tiles/step", v_8p_4x),
                     ("out HBM DMA", v_hbm_out)]:
        try:
            j = jax.jit(fn)
            ms = timeit(j, counts)
            print(f"{name:24s}: {ms:7.3f} ms "
                  f"({ms * 1e3 / N_TILES:5.2f} us/tile)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
