"""Pin the TPU gather cost model: rows vs bytes vs slab size.

Times row gathers at fixed total bytes (33.5MB) with varying row widths,
bf16 vs f32, and slab gathers (contiguous windows via lax.gather with big
slice_sizes) — decides the rasterizer data-movement design.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    total_elems = 524288 * 16  # 33.5 MB f32

    for rows, width in ((2097152, 4), (524288, 16), (131072, 64),
                        (32768, 256), (8192, 1024)):
        table = jnp.asarray(rng.normal(size=(131072, width)), np.float32)
        ids = jnp.asarray(rng.integers(0, 131072, rows), jnp.int32)
        g = jax.jit(lambda t, i: t[i])
        t = timeit(lambda: g(table, ids))
        print(f"f32 gather rows={rows:>8} width={width:>5}: {t:7.2f} ms "
              f"({rows/t/1e3:.0f}M rows/s)", flush=True)

    # bf16: same rows, half bytes
    table = jnp.asarray(rng.normal(size=(131072, 16)), np.float32).astype(jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, 131072, 524288), jnp.int32)
    g = jax.jit(lambda t, i: t[i])
    t = timeit(lambda: g(table, ids))
    print(f"bf16 gather rows=524288 width=16: {t:7.2f} ms", flush=True)

    # slab gather: 256 windows x 2048 contiguous elements
    src = jnp.asarray(rng.normal(size=(2101248,)), np.float32)
    starts = jnp.asarray(
        np.sort(rng.integers(0, 2097152, 256))[:, None], jnp.int32
    )

    @jax.jit
    def slab(src, starts):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(),
            start_index_map=(0,), operand_batching_dims=(),
            start_indices_batching_dims=(),
        )
        return jax.lax.gather(
            src, starts, dn, slice_sizes=(2048,),
            mode=jax.lax.GatherScatterMode.CLIP,
        )
    out = slab(src, starts)
    print("slab out", out.shape, flush=True)
    t = timeit(lambda: slab(src, starts))
    print(f"slab gather 256 x 2048 (2MB): {t:7.3f} ms", flush=True)

    # slab gather of 2D rows: 256 windows x 2048 rows x 16 cols
    src2 = jnp.asarray(rng.normal(size=(2101248, 4)), np.float32)

    @jax.jit
    def slab2(src, starts):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0,), operand_batching_dims=(),
            start_indices_batching_dims=(),
        )
        return jax.lax.gather(
            src, starts, dn, slice_sizes=(2048, 4),
            mode=jax.lax.GatherScatterMode.CLIP,
        )
    out2 = slab2(src2, starts)
    print("slab2 out", out2.shape, flush=True)
    t = timeit(lambda: slab2(src2, starts))
    print(f"slab gather 256 x (2048,4) (8MB): {t:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
