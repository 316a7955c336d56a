"""Attribute the compact-binning cost op by op.

Times cumulative prefixes of bin_gaussians_compact, each as one jit over
the real bench-scene projection; consecutive differences attribute cost to
the op added.  Each prefix ends in jnp.sum() so XLA cannot DCE the work
while outputs stay tiny.

Run: timeout 1400 env PYTHONPATH=/root/repo:/root/.axon_site \
  python -u benchmarks/bin_bisect.py > /tmp/binbis.log 2>&1
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from spfsplatv2_tpu.ops.raster_tiled import TILE, _cdiv


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
    from spfsplatv2_tpu.ops.covariance import build_covariance
    from spfsplatv2_tpu.ops.raster_common import project_gaussians

    h = w = 256
    g = 2 * h * w
    dup = 16
    entry_budget = 2 * g
    chunk = 256
    max_per_tile = 2048
    tiles_y, tiles_x = _cdiv(h, TILE), _cdiv(w, TILE)
    n_tiles = tiles_y * tiles_x

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 8)
    means = jnp.concatenate(
        [
            jax.random.uniform(keys[0], (g, 2), minval=-1.5, maxval=1.5),
            jax.random.uniform(keys[1], (g, 1), minval=1.0, maxval=6.0),
        ],
        axis=-1,
    )
    scales = 0.002 + 0.01 * jax.random.uniform(keys[2], (g, 3))
    covs = build_covariance(scales, jax.random.normal(keys[3], (g, 4)))
    harmonics = 0.3 * jax.random.normal(keys[4], (g, 3, 25))
    opacities = jax.random.uniform(keys[5], (g,), minval=0.3, maxval=0.9)
    kmat = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])
    c2w = jnp.eye(4)

    proj = jax.jit(lambda m, c, hh, o: project_gaussians(
        m, c, hh, o, c2w, kmat, (h, w), sh_degree=None, use_sh=True))(
        means, covs, harmonics, opacities)
    proj = jax.block_until_ready(proj)

    row_bits = max((g - 1).bit_length(), 1)
    sentinel_key = jnp.int32(n_tiles << row_bits)

    def stages(proj, upto):
        xy = proj.xy
        depth = proj.depth
        radius = proj.radius
        acc = jnp.zeros((), jnp.float32)

        depth_bits = jax.lax.bitcast_convert_type(
            depth.astype(jnp.float32), jnp.int32)
        order = jnp.argsort(depth_bits, stable=False).astype(jnp.int32)
        if upto == 0:
            return acc + jnp.sum(order).astype(jnp.float32)
        rank = jnp.zeros((g,), jnp.int32).at[order].set(
            jnp.arange(g, dtype=jnp.int32), unique_indices=True)
        if upto == 1:
            return acc + jnp.sum(rank).astype(jnp.float32)

        live_g = (radius > 0) & jnp.isfinite(depth)
        rx = proj.rx.astype(xy.dtype)
        ry = proj.ry.astype(xy.dtype)
        x0 = jnp.clip(jnp.floor((xy[:, 0] - rx) / TILE), 0, tiles_x).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor((xy[:, 1] - ry) / TILE), 0, tiles_y).astype(jnp.int32)
        x1 = jnp.clip(jnp.floor((xy[:, 0] + rx) / TILE) + 1, 0, tiles_x).astype(jnp.int32)
        y1 = jnp.clip(jnp.floor((xy[:, 1] + ry) / TILE) + 1, 0, tiles_y).astype(jnp.int32)
        bw = jnp.where(live_g, x1 - x0, 0)
        bh = jnp.where(live_g, y1 - y0, 0)
        n_touched = bw * bh
        d = jnp.arange(dup, dtype=jnp.int32)[None, :]
        bw_safe = jnp.maximum(bw, 1)[:, None]
        dy = d // bw_safe
        dx = d % bw_safe
        slot_ok = (d < n_touched[:, None]) & live_g[:, None]
        tile_id = (y0[:, None] + dy) * tiles_x + (x0[:, None] + dx)
        key = jnp.where(
            slot_ok, tile_id * jnp.int32(1 << row_bits) + rank[:, None],
            sentinel_key).reshape(-1)
        if upto == 2:
            return acc + jnp.sum(key).astype(jnp.float32)

        key_sorted = jax.lax.sort(key, dimension=0, is_stable=False)
        if upto == 3:
            return acc + jnp.sum(key_sorted).astype(jnp.float32)

        bound = jnp.arange(n_tiles + 1, dtype=jnp.int32) * jnp.int32(1 << row_bits)
        tile_starts = jnp.searchsorted(key_sorted, bound).astype(jnp.int32)
        counts = jnp.minimum(tile_starts[1:] - tile_starts[:-1], max_per_tile)
        e_aligned = -(-entry_budget // chunk) * chunk + n_tiles * chunk
        caps = ((counts + (chunk - 1)) // chunk) * chunk
        raw_starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(caps)[:-1].astype(jnp.int32)])
        fits = raw_starts + caps <= e_aligned
        counts = jnp.where(fits, counts, 0)
        starts = raw_starts
        if upto == 4:
            return acc + jnp.sum(starts + counts).astype(jnp.float32)

        n_chunks = e_aligned // chunk
        chunk_to_tile = (
            jnp.searchsorted(
                starts, jnp.arange(n_chunks, dtype=jnp.int32) * chunk,
                side="right").astype(jnp.int32) - 1)

        def per_slot(table):
            return jnp.broadcast_to(
                table[chunk_to_tile][:, None], (n_chunks, chunk)).reshape(-1)

        slot = jnp.arange(e_aligned, dtype=jnp.int32)
        off = slot - per_slot(starts)
        slot_live = (off >= 0) & (off < per_slot(counts))
        if upto == 5:
            return acc + jnp.sum(slot_live).astype(jnp.float32)
        p = jnp.where(
            slot_live,
            jnp.minimum(per_slot(tile_starts[:-1]) + jnp.maximum(off, 0),
                        g * dup - 1),
            slot % jnp.int32(g * dup))
        key_at = key_sorted[p]
        if upto == 6:
            return acc + jnp.sum(key_at).astype(jnp.float32)
        orig = order[key_at & jnp.int32((1 << row_bits) - 1)]
        src = jnp.where(slot_live, orig, slot % jnp.int32(g))
        return acc + jnp.sum(src).astype(jnp.float32)

    names = ["argsort", "+rank scatter", "+expand/key", "+sort 2M",
             "+starts/counts", "+slot_live", "+key_sorted[p]", "+order[rank]"]
    prev = 0.0
    for i, name in enumerate(names):
        f = jax.jit(lambda p, i=i: stages(p, i))
        ms = timeit(f, proj)
        print(f"{name:18s}: {ms:7.2f} ms  (delta {ms - prev:+7.2f})",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
