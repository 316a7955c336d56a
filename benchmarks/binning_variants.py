"""Compare tile-binning strategies on the real chip.

Candidates for replacing the round-1 3-stream stable sort:
  A. 2-stream stable sort by 9-bit tile key (round-1 minus dup stream)
  B. packed 30-bit single-key sort (measured 2.7x WORSE — key width
     dominates TPU sort cost; kept here as evidence)
  C. counting sort: separable bbox one-hot block matmul prefix + scatter
  D. pieces: depth argsort alone, scatter alone (to locate the cost)

Run: timeout 1400 python -u benchmarks/binning_variants.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

TILE = 16


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def make_inputs(g, h, w, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    xy = jax.random.uniform(k1, (g, 2), minval=-20.0, maxval=float(w) + 20)
    depth = jax.random.uniform(k2, (g,), minval=0.5, maxval=10.0)
    radius = (jax.random.uniform(k3, (g,), minval=2.0, maxval=10.0)).astype(
        jnp.float32
    )
    return xy, depth, radius


def bboxes(xy, radius, tiles_x, tiles_y, live):
    r = radius
    x0 = jnp.clip(jnp.floor((xy[:, 0] - r) / TILE), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((xy[:, 1] - r) / TILE), 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((xy[:, 0] + r) / TILE) + 1, 0, tiles_x).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((xy[:, 1] + r) / TILE) + 1, 0, tiles_y).astype(jnp.int32)
    x0 = jnp.where(live, x0, 0)
    x1 = jnp.where(live, x1, 0)
    y0 = jnp.where(live, y0, 0)
    y1 = jnp.where(live, y1, 0)
    return x0, x1, y0, y1


def entries(x0, x1, y0, y1, d_cap, tiles_x, n_tiles):
    bw = x1 - x0
    n_touched = bw * (y1 - y0)
    d = jnp.arange(d_cap, dtype=jnp.int32)[None, :]
    bw_safe = jnp.maximum(bw, 1)[:, None]
    dy = d // bw_safe
    dx = d % bw_safe
    ok = d < n_touched[:, None]
    tile_id = jnp.where(
        ok, (y0[:, None] + dy) * tiles_x + (x0[:, None] + dx), n_tiles
    ).astype(jnp.int32)
    return tile_id


def main():
    h = w = 256
    g = 131072
    d_cap = 16
    tiles_x = tiles_y = w // TILE
    n_tiles = tiles_x * tiles_y
    xy, depth, radius = make_inputs(g, h, w)
    live = radius > 0

    # ---------- D1: depth argsort alone
    @jax.jit
    def argsort_depth(depth):
        return jnp.argsort(depth).astype(jnp.int32)
    t = timeit(lambda: argsort_depth(depth))
    print(f"D1 depth argsort (g={g}): {t:.2f} ms", flush=True)

    # ---------- A: 2-stream stable sort by tile key
    @jax.jit
    def variant_a(xy, depth, radius):
        order = jnp.argsort(depth).astype(jnp.int32)
        xys = xy[order]
        rs = radius[order]
        x0, x1, y0, y1 = bboxes(xys, rs, tiles_x, tiles_y, rs > 0)
        tile_id = entries(x0, x1, y0, y1, d_cap, tiles_x, n_tiles)
        gid = jnp.broadcast_to(order[:, None], tile_id.shape)
        tile_sorted, ids_sorted = jax.lax.sort(
            (tile_id.reshape(-1), gid.reshape(-1)),
            dimension=0, num_keys=1, is_stable=True,
        )
        starts = jnp.searchsorted(
            tile_sorted, jnp.arange(n_tiles + 1, dtype=jnp.int32)
        ).astype(jnp.int32)
        return ids_sorted, starts
    t = timeit(lambda: variant_a(xy, depth, radius))
    print(f"A  2-stream stable tile sort: {t:.2f} ms", flush=True)

    # ---------- A2: the real bin_gaussians on equivalent inputs
    from spfsplatv2_tpu.ops import raster_tiled
    from spfsplatv2_tpu.ops.raster_common import ProjectedGaussians

    import os
    if os.path.exists("/tmp/real_proj.npz"):
        # arrays dumped by benchmarks/raster_stages.py — the REAL bench
        # distribution, device_put once
        d = np.load("/tmp/real_proj.npz")
        xy_r = jax.device_put(jnp.asarray(d["xy"]))
        depth_r = jax.device_put(jnp.asarray(d["depth"]))
        radius_r = jax.device_put(jnp.asarray(d["radius"]))
        print("using REAL proj dump for A2", flush=True)
    else:
        xy_r, depth_r, radius_r = xy, depth, radius.astype(jnp.int32)

    proj = ProjectedGaussians(
        xy=xy_r,
        conic=jnp.ones((g, 3), jnp.float32),
        depth=depth_r,
        color=jnp.ones((g, 3), jnp.float32),
        opacity=jnp.ones((g,), jnp.float32),
        radius=radius_r.astype(jnp.int32),
    )

    @jax.jit
    def variant_a2(proj):
        b = raster_tiled.bin_gaussians(proj, (h, w), d_cap)
        return b.ids_sorted, b.tile_starts
    t = timeit(lambda: variant_a2(proj))
    print(f"A2 real bin_gaussians: {t:.2f} ms", flush=True)

    # ---------- A3: variant A but fed the whole proj tuple
    @jax.jit
    def variant_a3(proj):
        return variant_a.__wrapped__(proj.xy, proj.depth,
                                     proj.radius.astype(jnp.float32))
    t = timeit(lambda: variant_a3(proj))
    print(f"A3 variant A w/ proj arg: {t:.2f} ms", flush=True)

    # ---------- C: counting sort (block-matmul prefix + scatter)
    max_per_tile = 2048
    kblk = 8          # within-block serial prefix window
    nblk = g // kblk

    @jax.jit
    def variant_c(xy, depth, radius):
        order = jnp.argsort(depth).astype(jnp.int32)
        xys = xy[order]
        rs = radius[order]
        x0, x1, y0, y1 = bboxes(xys, rs, tiles_x, tiles_y, rs > 0)

        # one-hot interval indicators, bf16 for the MXU
        txs = jnp.arange(tiles_x, dtype=jnp.int32)
        tys = jnp.arange(tiles_y, dtype=jnp.int32)
        X = ((x0[:, None] <= txs) & (txs < x1[:, None]))  # (g, tiles_x)
        Y = ((y0[:, None] <= tys) & (tys < y1[:, None]))  # (g, tiles_y)
        Xb = X.reshape(nblk, kblk, tiles_x).astype(jnp.bfloat16)
        Yb = Y.reshape(nblk, kblk, tiles_y).astype(jnp.bfloat16)
        # per-block tile histogram via batched matmul (MXU)
        S = jnp.einsum("bkx,bky->bxy", Xb, Yb,
                       preferred_element_type=jnp.float32)  # (nblk, tx, ty)
        base = jnp.cumsum(S, axis=0) - S  # exclusive block prefix (f32)
        # NOTE: tile id = ty * tiles_x + tx  => arrange as (ty, tx)
        base = base.transpose(0, 2, 1).reshape(nblk, n_tiles)

        # per-entry tile ids (g, d_cap)
        tile_id = entries(x0, x1, y0, y1, d_cap, tiles_x, n_tiles)

        # within-block exclusive prefix: for entry of gaussian i (block b,
        # lane j), count earlier gaussians j' < j in the same block that
        # touch this entry's tile.
        blk = jnp.arange(g, dtype=jnp.int32) // kblk
        lane = jnp.arange(g, dtype=jnp.int32) % kblk
        # gather block base per entry (flat gather, no (g, n_tiles) temp)
        base_e = base.reshape(-1)[
            blk[:, None] * n_tiles + jnp.minimum(tile_id, n_tiles - 1)
        ]  # (g, d_cap) counts from earlier blocks
        # serial within-block: compare against the (kblk-1) predecessors
        tx_e = tile_id % tiles_x
        ty_e = jnp.minimum(tile_id, n_tiles - 1) // tiles_x
        within = jnp.zeros(tile_id.shape, jnp.int32)
        for back in range(1, kblk):
            j = jnp.arange(g, dtype=jnp.int32) - back
            same_block = lane >= back
            jc = jnp.maximum(j, 0)
            hit = (
                (x0[jc][:, None] <= tx_e) & (tx_e < x1[jc][:, None])
                & (y0[jc][:, None] <= ty_e) & (ty_e < y1[jc][:, None])
                & same_block[:, None]
            )
            within = within + hit.astype(jnp.int32)
        rank = base_e.astype(jnp.int32) + within
        valid = (tile_id < n_tiles) & (rank < max_per_tile)
        dst = jnp.where(valid, tile_id * max_per_tile + rank, n_tiles * max_per_tile)
        ids = jnp.broadcast_to(order[:, None], tile_id.shape).reshape(-1)
        out = jnp.full((n_tiles * max_per_tile + 1,), g, jnp.int32)
        out = out.at[dst.reshape(-1)].set(ids, mode="drop", unique_indices=True)
        counts = (
            jnp.cumsum(S.sum(0).transpose(1, 0).reshape(-1))  # total per tile
        )
        return out[:-1], counts
    t = timeit(lambda: variant_c(xy, depth, radius))
    print(f"C  counting sort (matmul+scatter): {t:.2f} ms", flush=True)

    # ---------- D2: the scatter alone
    dst = np.random.permutation(n_tiles * max_per_tile)[: g * d_cap // 4]
    dst = jnp.asarray(np.sort(dst), jnp.int32)
    vals = jnp.arange(dst.shape[0], dtype=jnp.int32)

    @jax.jit
    def scatter_only(dst, vals):
        out = jnp.full((n_tiles * max_per_tile,), -1, jnp.int32)
        return out.at[dst].set(vals, mode="drop", unique_indices=True)
    t = timeit(lambda: scatter_only(dst, vals))
    print(f"D2 scatter alone ({dst.shape[0]} upd): {t:.2f} ms", flush=True)

    # correctness cross-check A vs C
    ids_a, starts_a = variant_a(xy, depth, radius)
    ids_c, _ = variant_c(xy, depth, radius)
    ok = True
    ids_a = np.asarray(ids_a)
    starts_a = np.asarray(starts_a)
    ids_c = np.asarray(ids_c).reshape(n_tiles, max_per_tile)
    for tidx in (0, 1, 57, 200):
        seg = ids_a[starts_a[tidx]: starts_a[tidx + 1]][:max_per_tile]
        seg_c = ids_c[tidx][: len(seg)]
        if not np.array_equal(seg, seg_c):
            ok = False
            print(f"tile {tidx} MISMATCH a={seg[:8]} c={seg_c[:8]}", flush=True)
    print(f"A-vs-C per-tile lists equal: {ok}", flush=True)


if __name__ == "__main__":
    main()
