"""Locate the cost inside align_bins + attribute gather (6.9 ms measured).

Pieces: (1) 2D window gather of ids, (2) row gather packed[ids],
(3) transpose to (FEAT, E_cap), (4) lane gather packed.T[:, ids],
(5) fused row-gather+transpose, (6) bf16 row gather.

Run: timeout 1400 python -u benchmarks/gather_variants.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

FEAT = 16


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
    g = 131072
    n_tiles = 256
    max_per_tile = 2048
    e_cap = n_tiles * max_per_tile
    n_sorted = g * 16

    rng = np.random.default_rng(0)
    ids_sorted = jnp.asarray(
        rng.integers(0, g, size=(n_sorted,)), jnp.int32
    )
    starts_np = np.sort(rng.integers(0, n_sorted, size=(n_tiles + 1,)))
    starts_np[0], starts_np[-1] = 0, 211000
    tile_starts = jnp.asarray(starts_np, jnp.int32)
    packed = jnp.asarray(rng.normal(size=(g + 1, FEAT)), jnp.float32)
    ids_flat = jnp.asarray(
        rng.integers(0, g, size=(e_cap,)), jnp.int32
    )

    # 1: window gather of ids
    @jax.jit
    def window_gather(ids_sorted, tile_starts):
        starts = tile_starts[:-1]
        counts = jnp.minimum(tile_starts[1:] - tile_starts[:-1], max_per_tile)
        ids_padded = jnp.concatenate(
            [ids_sorted, jnp.full((max_per_tile,), g, jnp.int32)]
        )
        offset = jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
        src = starts[:, None] + offset
        valid = offset < counts[:, None]
        return jnp.where(valid, ids_padded[src], g).reshape(-1)
    t = timeit(lambda: window_gather(ids_sorted, tile_starts))
    print(f"1 window gather ids ({e_cap}): {t:.2f} ms", flush=True)

    # 2: row gather
    row_gather = jax.jit(lambda p, i: p[i])
    t = timeit(lambda: row_gather(packed, ids_flat))
    print(f"2 row gather packed[ids] ({e_cap}x{FEAT}): {t:.2f} ms", flush=True)

    # 3: transpose
    rows = row_gather(packed, ids_flat)
    tr = jax.jit(lambda r: r.T)
    t = timeit(lambda: tr(rows))
    print(f"3 transpose (E,F)->(F,E): {t:.2f} ms", flush=True)

    # 4: lane gather
    lane_gather = jax.jit(lambda p, i: p.T[:, i])
    t = timeit(lambda: lane_gather(packed, ids_flat))
    print(f"4 lane gather packed.T[:, ids]: {t:.2f} ms", flush=True)

    # 5: fused row gather + transpose
    fused = jax.jit(lambda p, i: p[i].T)
    t = timeit(lambda: fused(packed, ids_flat))
    print(f"5 fused row gather + T: {t:.2f} ms", flush=True)

    # 6: 2D window id gather + row gather + T end-to-end
    @jax.jit
    def full(p, ids_sorted, tile_starts):
        ids = window_gather(ids_sorted, tile_starts)
        return p[ids].T
    t = timeit(lambda: full(packed, ids_sorted, tile_starts))
    print(f"6 window+row+T end-to-end: {t:.2f} ms", flush=True)

    # 7: row gather via one-level take
    take = jax.jit(lambda p, i: jnp.take(p, i, axis=0, unique_indices=False,
                                         indices_are_sorted=False))
    t = timeit(lambda: take(packed, ids_flat))
    print(f"7 jnp.take rows: {t:.2f} ms", flush=True)

    # 8: the gather VJP (scatter-add back to gaussians)
    @jax.jit
    def gather_grad(p, i):
        def f(p):
            return jnp.sum(p[i] * 1.5)
        return jax.grad(f)(p)
    t = timeit(lambda: gather_grad(packed, ids_flat))
    print(f"8 gather VJP scatter-add: {t:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
