"""Validate the scatter-only binning redesign's primitive costs.

1. reproduce the in-graph 5.1 ms attrs gather in isolation with REAL ids
2. unique drop-mode set-scatter of 2M x16 rows (the fwd attrs placement)
3. unique set-scatter of 524k x16 rows into a 2.6M-row buffer (bwd e-space)
4. contiguous (g, D, 16) -> (g, 16) reduction
5. scatter-add with duplicate ids (current VJP) for comparison
"""

import time

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
    from spfsplatv2_tpu.ops import raster_pallas, raster_tiled
    from spfsplatv2_tpu.ops.raster_common import ProjectedGaussians

    g = 131072
    d_cap = 16
    n_tiles = 256
    max_per_tile = 2048
    e_cap = n_tiles * max_per_tile
    chunk = 256

    d = np.load("/tmp/real_proj.npz")
    proj = ProjectedGaussians(
        xy=jnp.asarray(d["xy"]),
        conic=jnp.ones((g, 3), jnp.float32),
        depth=jnp.asarray(d["depth"]),
        color=jnp.ones((g, 3), jnp.float32),
        opacity=jnp.ones((g,), jnp.float32),
        radius=jnp.asarray(d["radius"]),
    )

    @jax.jit
    def ids_fn(proj):
        bins = raster_tiled.bin_gaussians(proj, (256, 256), d_cap)
        ids, counts = raster_pallas.align_bins(
            bins, chunk, max_per_tile, g)
        return ids, counts
    ids, counts = ids_fn(proj)
    ids = jax.device_put(jax.device_get(ids))  # detach from the graph
    print("real ids ready; live", int(jnp.sum(counts)), flush=True)

    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.normal(size=(g, 16)), np.float32)

    # 1. the real gather in isolation
    gather = jax.jit(lambda p, i: p[i])
    t = timeit(lambda: gather(packed, ids))
    print(f"1 gather packed[real_ids] (524k rows): {t:.2f} ms", flush=True)
    rand_ids = jnp.asarray(rng.integers(0, g, e_cap), jnp.int32)
    t = timeit(lambda: gather(packed, rand_ids))
    print(f"1b gather packed[random ids]: {t:.2f} ms", flush=True)
    # gather + transpose (the kernel layout)
    gather_t = jax.jit(lambda p, i: p[i].T)
    t = timeit(lambda: gather_t(packed, ids))
    print(f"1c gather + transpose: {t:.2f} ms", flush=True)

    # 2. unique drop scatter: 2M expanded rows -> (E_cap, 16)
    dst = jnp.asarray(
        rng.permutation(4 * e_cap)[: g * d_cap] % (e_cap + 7919), jnp.int32
    )  # mostly-unique spread destinations with drops

    @jax.jit
    def fwd_scatter(p, dst):
        upd = jnp.broadcast_to(p[:, None, :], (g, d_cap, 16)).reshape(-1, 16)
        out = jnp.zeros((e_cap, 16), jnp.float32)
        return out.at[dst].set(upd, mode="drop", unique_indices=True)
    t = timeit(lambda: fwd_scatter(packed, dst))
    print(f"2 unique set-scatter 2M rows -> (524k,16): {t:.2f} ms", flush=True)

    # 3. unique set-scatter 524k rows -> (2.6M, 16)
    dattrs = jnp.asarray(rng.normal(size=(e_cap, 16)), np.float32)
    e_of_p = jnp.asarray(rng.permutation(g * d_cap + e_cap)[:e_cap], jnp.int32)

    @jax.jit
    def bwd_scatter(da, e_of_p):
        out = jnp.zeros((g * d_cap + e_cap, 16), jnp.float32)
        return out.at[e_of_p].set(da, mode="drop", unique_indices=True)
    t = timeit(lambda: bwd_scatter(dattrs, e_of_p))
    print(f"3 unique set-scatter 524k rows -> (2.6M,16): {t:.2f} ms",
          flush=True)

    # 4. contiguous reduce (g, D, 16) -> (g, 16)
    big = bwd_scatter(dattrs, e_of_p)

    @jax.jit
    def reduce_fn(big):
        return big[: g * d_cap].reshape(g, d_cap, 16).sum(1)
    t = timeit(lambda: reduce_fn(big))
    print(f"4 contiguous (g,16,16) reduce: {t:.2f} ms", flush=True)

    # 5. duplicate scatter-add (current VJP shape) for reference
    @jax.jit
    def dup_scatter(da, ids):
        out = jnp.zeros((g, 16), jnp.float32)
        return out.at[ids].add(da)
    t = timeit(lambda: dup_scatter(dattrs, ids))
    print(f"5 duplicate scatter-ADD 524k rows (real ids): {t:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
