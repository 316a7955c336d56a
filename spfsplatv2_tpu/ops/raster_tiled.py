"""Tile-binned differentiable Gaussian compositing in pure XLA.

TPU-native re-design of the reference CUDA rasterizer's binning + per-tile
compositing (external `diff_gauss_pose` package; call surface reference
src/model/decoder/cuda_splatting.py:45-144). Design:

  1. Every Gaussian is expanded into up to `max_tiles_per_gaussian` (tile,
     depth-rank) entries (static cap => static shapes for XLA), mirroring the
     CUDA duplicate-and-sort approach but with a fixed duplication budget and
     ellipse-AABB tile footprints instead of the circular getRect.
  2. One `jax.lax.sort` over (tile_id, depth_rank) replaces the CUDA radix
     sort; per-tile segments are found with searchsorted.  The Pallas path
     uses `bin_gaussians_prefix` (the sort's live prefix IS the slot
     space — see PrefixBins); this module's `bin_gaussians` keeps the
     simpler layout for the pure-XLA compositor.
  3. Each 16x16 tile composites a fixed-size window of its front-most
     `max_per_tile` entries in chunks. Within a chunk the front-to-back
     recurrence T_{i+1} = T_i * (1 - a_i) is evaluated with a cumulative
     product, which turns per-pixel sequential blending into dense
     (pixels x chunk) VPU math plus one (pixels x chunk) @ (chunk x 3)
     MXU matmul per chunk — this is the TPU-native formulation of splatting.

The whole thing is differentiable by XLA autodiff (gathers become
scatter-adds in the backward pass), so gradients reach means/covariances/
SH/opacity and the camera pose exactly like the `diff_gauss_pose` fork's
hand-written backward. The CUDA early-termination semantics (break when
transmittance would drop below 1e-4) are reproduced exactly via a cumulative
mask, so outputs match `raster_ref.composite_reference` to float tolerance.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from spfsplatv2_tpu.ops.raster_common import (
    ProjectedGaussians,
    T_EPS,
    alpha_from_conic,
)

TILE = 16
PIX_PER_TILE = TILE * TILE


class TileBins(NamedTuple):
    ids_sorted: jax.Array    # (n_entries,) gaussian index per sorted entry
    tile_starts: jax.Array   # (n_tiles + 1,) segment starts into ids_sorted
    num_tiles_xy: tuple[int, int]  # (tiles_y, tiles_x) static
    max_tiles_per_gaussian: int = 0
    # Depth permutation: ids_sorted indexes gaussians AFTER this permutation
    # (attribute tables must be permuted by `order` before gathering by
    # ids_sorted).  None means ids_sorted is in original index space.
    order: jax.Array | None = None


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def bin_gaussians(
    proj: ProjectedGaussians,
    image_shape: tuple[int, int],
    max_tiles_per_gaussian: int,
) -> TileBins:
    """Build depth-sorted per-tile entry lists (non-differentiable)."""
    assert max_tiles_per_gaussian >= 1, max_tiles_per_gaussian
    h, w = image_shape
    tiles_y, tiles_x = _cdiv(h, TILE), _cdiv(w, TILE)
    n_tiles = tiles_y * tiles_x

    xy = jax.lax.stop_gradient(proj.xy)
    depth = jax.lax.stop_gradient(proj.depth)
    radius = proj.radius
    g = xy.shape[0]

    # Permute gaussians into depth order FIRST; duplicate slots generated in
    # this order are already front-to-back, so a single sort keyed by
    # (tile, depth-rank) suffices — and because the permuted ROW index is
    # the depth rank, tile and rank pack into one narrow integer key.
    order = jnp.argsort(depth, stable=False).astype(jnp.int32)
    xy = xy[order]
    radius = radius[order]
    depth_s = depth[order]

    live = (radius > 0) & jnp.isfinite(depth_s)

    # Tile bbox exactly like the CUDA getRect.
    r = radius.astype(xy.dtype)
    x0 = jnp.clip(jnp.floor((xy[:, 0] - r) / TILE), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((xy[:, 1] - r) / TILE), 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((xy[:, 0] + r) / TILE) + 1, 0, tiles_x).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((xy[:, 1] + r) / TILE) + 1, 0, tiles_y).astype(jnp.int32)
    bw = jnp.where(live, x1 - x0, 0)
    bh = jnp.where(live, y1 - y0, 0)
    n_touched = bw * bh

    # Expand to (g, d) duplicate slots, row-major over the bbox.
    d = jnp.arange(max_tiles_per_gaussian, dtype=jnp.int32)[None, :]
    bw_safe = jnp.maximum(bw, 1)[:, None]
    dy = d // bw_safe
    dx = d % bw_safe
    slot_ok = (d < n_touched[:, None]) & live[:, None]
    tile_id = jnp.where(
        slot_ok, (y0[:, None] + dy) * tiles_x + (x0[:, None] + dx), n_tiles
    ).astype(jnp.int32)

    # ONE-STREAM UNSTABLE sort.  An XLA stable sort on TPU materializes a
    # hidden iota tiebreaker stream, and key + 2 payloads falls off the
    # fast sort path (~80x: 0.12 ms vs 9.6 ms at 2M entries).  The permuted
    # row index IS the depth rank, so key = tile * 2^ceil_log2(g) + row
    # encodes (tile, front-to-back order, identity) in one integer and the
    # sort carries no payload at all.  ids_sorted then indexes PERMUTED
    # rows; TileBins.order carries the permutation for attribute tables.
    row_bits = max((g - 1).bit_length(), 1)
    key_max_bits = row_bits + (n_tiles + 1).bit_length()
    row = jnp.broadcast_to(
        jnp.arange(g, dtype=jnp.int32)[:, None], tile_id.shape
    )
    if key_max_bits <= 31:
        key = tile_id * jnp.int32(1 << row_bits) + row
        key_sorted = jax.lax.sort(key.reshape(-1), dimension=0,
                                  is_stable=False)
        ids_sorted = jnp.bitwise_and(key_sorted, jnp.int32((1 << row_bits) - 1))
        tile_starts = jnp.searchsorted(
            key_sorted,
            jnp.arange(n_tiles + 1, dtype=jnp.int32) * jnp.int32(1 << row_bits),
        ).astype(jnp.int32)
    else:
        # Key would overflow int32 (huge scenes at high resolution): fall
        # back to the 2-key unstable sort (2 streams, no hidden iota).
        tile_sorted, ids_sorted = jax.lax.sort(
            (tile_id.reshape(-1), row.reshape(-1)),
            dimension=0, num_keys=2, is_stable=False,
        )
        tile_starts = jnp.searchsorted(
            tile_sorted, jnp.arange(n_tiles + 1, dtype=jnp.int32)
        ).astype(jnp.int32)
    return TileBins(
        ids_sorted, tile_starts, (tiles_y, tiles_x), max_tiles_per_gaussian,
        order,
    )


class PrefixBins(NamedTuple):
    """Prefix entry layout: sorted live entries ARE the slot space.

    vs the retired chunk-aligned compact layout: no re-packing pass.  The binning
    sort's live prefix (entries sorted by (tile, depth-rank), dead slots
    sunk to the tail behind a sentinel key) is used directly; tile t's
    segment is [starts[t], starts[t] + counts[t]) at ARBITRARY offsets and
    the Pallas kernels handle the unaligned heads (they DMA from the
    128-aligned floor and mask the head lanes).  This deletes the
    slot->sorted-position gather (~2.3 ms/camera) and the ~25% alignment
    slack in every per-index pass (gather + backward scatter).

    Windows tile [0, n_live) contiguously (no per-tile entry cap — only the
    global budget clamps, dropping the DEEPEST entries of boundary tiles),
    so backward validity is one suffix mask `slot < n_live` instead of a
    per-slot liveness stream.

    flat: (e_pad,) flat expansion slot (row * dup + d) per sorted slot —
          unique across live AND dead slots, so the backward accumulation
          is a unique-index scatter-SET into (g * dup, C) + a dense
          reshape-sum, never a duplicate-index scatter-add.
    src:  (e_pad,) = flat // dup, the gaussian row feeding each slot.
    """

    flat: jax.Array          # (e_pad,)
    src: jax.Array           # (e_pad,)
    counts: jax.Array        # (n_tiles,)
    starts: jax.Array        # (n_tiles,) raw (unaligned) segment starts
    n_live: jax.Array        # () int32: live slots (suffix mask bound)
    num_tiles_xy: tuple[int, int]
    e_pad: int
    dup: int
    # () int32: live entries beyond the budget (dropped, deepest-first).
    # Surfaced as the raster/dropped_entries train metric so silent
    # budget overflow is observable.
    n_overflow: jax.Array = jnp.zeros((), jnp.int32)
    # Two-tier expansion split (see bin_gaussians_prefix): flat ids
    # < g * base_dup are tier-A (row * base_dup + d); the rest are tier-B
    # pool slots (g * base_dup + row * (dup - base_dup) + d').  base_dup ==
    # dup means single-tier.
    base_dup: int = 0
    # Backward-accumulation order (round 4): src_order permutes entry
    # slots into non-decreasing source-gaussian order (src_sorted =
    # src[src_order]).  The backward then reduces per-entry gradients
    # scatter-free (scatter costs ~110 ns/index on v5e; see
    # benchmarks/scatter_alternatives_probe.py).  Computed in the forward
    # (indices don't depend on cotangents).  Round 5: positions >= n_live
    # (dead slots AND budget-dropped entries) are clamped to segment g
    # before this sort, so the permuted stream's per-gaussian run lengths
    # are exactly `live_counts` when no budget drop occurred.
    src_order: jax.Array | None = None   # (e_pad,)
    src_sorted: jax.Array | None = None  # (e_pad,)
    # Round-5 segmented-scan accumulation support: analytic per-gaussian
    # kept-live entry counts, their inclusive cumsum (segment ENDS in the
    # permuted stream), and whether the entry budget dropped live entries
    # (ends no longer match the stream -> backward falls back to
    # segment_sum).  See raster_pallas._prefix_core_bwd.
    live_counts: jax.Array | None = None  # (g,)
    ends: jax.Array | None = None         # (g,)
    has_drops: jax.Array | None = None    # () bool


def bin_gaussians_prefix(
    proj: ProjectedGaussians,
    image_shape: tuple[int, int],
    max_tiles_per_gaussian: int,
    chunk: int,
    entry_budget: int,
    base_tiles_per_gaussian: int | None = None,
    big_pool_factor: float = 0.125,
    depth_key: str = "rank",
    interpret: bool | None = None,
) -> PrefixBins:
    """Prefix-layout binning (non-differentiable).  See PrefixBins.

    Duplicate expansion + single (key, payload) unstable sort; the payload
    is the flat expansion slot and the sorted order is used as-is — no
    slot re-packing stage.  entry_budget bounds the live slots kept;
    entries past it (the deepest of the back tiles) are dropped.

    TWO-TIER expansion (base_tiles_per_gaussian = dup_a < dup): pixel-
    aligned clouds average ~1.5 touched tiles per gaussian, so a flat
    (g, dup) grid sorts ~90% dead slots.  Tier A gives every gaussian
    dup_a slots; gaussians touching more tiles are compacted (one cheap
    g-length sort on a binary key) into a static pool of
    B = max(64, g * big_pool_factor) rows that each carry the remaining
    (dup - dup_a) slots.  Sort size drops g*dup -> g*dup_a + B*(dup-dup_a)
    (2M -> ~720k at the bench shape) with IDENTICAL output: the same
    (tile, depth-rank) key set is materialized, only from different slot
    ids.  Gaussians beyond the pool lose their tier-B tiles; those drops
    are counted in n_overflow (observable as raster/dropped_entries).
    """
    assert max_tiles_per_gaussian >= 1, max_tiles_per_gaussian
    h, w = image_shape
    tiles_y, tiles_x = _cdiv(h, TILE), _cdiv(w, TILE)
    n_tiles = tiles_y * tiles_x

    xy = jax.lax.stop_gradient(proj.xy)
    depth = jax.lax.stop_gradient(proj.depth)
    radius = proj.radius
    g = xy.shape[0]
    dup = max_tiles_per_gaussian
    dup_a = base_tiles_per_gaussian
    if dup_a is None or dup_a >= dup:
        dup_a = dup
    extra = dup - dup_a

    live_g = (radius > 0) & jnp.isfinite(depth)

    # Depth key for within-tile front-to-back ordering.  "rank": exact
    # dense rank via double argsort (the second argsort IS the inverse
    # permutation — a sort beats a g-length scatter, see PERFORMANCE.md
    # rule 2).  "quantized": the top key bits of the f32 depth bitcast
    # directly — no argsort at all; ties (same top ~22 bits, i.e. depths
    # equal to ~1e-4 relative) compose in arbitrary order.
    depth_bits = jax.lax.bitcast_convert_type(
        depth.astype(jnp.float32), jnp.int32
    )
    row_bits_needed = max((g - 1).bit_length(), 1)
    tile_bits = (n_tiles + 1).bit_length()
    if depth_key == "quantized":
        row_bits = 31 - tile_bits
        rank = jnp.right_shift(
            jnp.maximum(depth_bits, 0), jnp.int32(31 - row_bits)
        )
    elif depth_key == "rank":
        row_bits = row_bits_needed
        order = jnp.argsort(depth_bits, stable=False).astype(jnp.int32)
        rank = jnp.argsort(order, stable=False).astype(jnp.int32)
    else:
        raise ValueError(f"bad depth_key {depth_key!r}")

    rx = proj.rx.astype(xy.dtype)
    ry = proj.ry.astype(xy.dtype)
    x0 = jnp.clip(jnp.floor((xy[:, 0] - rx) / TILE), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((xy[:, 1] - ry) / TILE), 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((xy[:, 0] + rx) / TILE) + 1, 0, tiles_x).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((xy[:, 1] + ry) / TILE) + 1, 0, tiles_y).astype(jnp.int32)
    bw = jnp.where(live_g, x1 - x0, 0)
    bh = jnp.where(live_g, y1 - y0, 0)
    n_touched = bw * bh

    if row_bits + tile_bits > 31:
        raise ValueError(
            f"prefix binning key overflows int32 for g={g}, "
            f"n_tiles={n_tiles}; use depth_key='quantized'"
        )
    sentinel_key = jnp.int32(n_tiles << row_bits)
    bw_safe = jnp.maximum(bw, 1)

    def tier_keys(rows_sel, d_lo, d_hi, row_live):
        """(tile<<row_bits | rank) keys for slots d in [d_lo, d_hi).

        The bbox slot -> (dx, dy) mapping is an INCREMENTAL walk instead
        of `d // bw, d % bw`: integer div/mod by a VARIABLE divisor has
        no strength reduction on the VPU (~10x the cost of the adds) and
        was the hidden bulk of the binning stage at 720k slots.
        """
        sel = (lambda a: a[rows_sel]) if rows_sel is not None else (lambda a: a)
        bws = sel(bw_safe)
        nt = sel(n_touched)
        rk = sel(rank)
        shift = jnp.int32(1 << row_bits)
        cols = []
        dx = jnp.zeros_like(bws)
        tid = sel(y0) * tiles_x + sel(x0)
        for d in range(d_hi):
            if d >= d_lo:
                ok = (d < nt) & row_live
                cols.append(jnp.where(ok, tid * shift + rk, sentinel_key))
            nx = dx + 1
            wrap = nx >= bws
            dx = jnp.where(wrap, 0, nx)
            # wrap: (bw-1, dy) -> (0, dy+1): tid += tiles_x - bw + 1.
            tid = jnp.where(wrap, tid + (tiles_x - bws + 1), tid + 1)
        return jnp.stack(cols, axis=1)

    key_a = tier_keys(None, 0, dup_a, live_g)              # (g, dup_a)
    flat_a = jnp.arange(g * dup_a, dtype=jnp.int32)

    from spfsplatv2_tpu.ops.segscan import cumsum_1d

    if extra > 0:
        # Compact "big" rows (touch more than dup_a tiles) to a static
        # pool.  Selection is the LOWEST-row-id big rows (single-stream
        # sort on (!big << 30 | row)): deterministic AND analytically
        # invertible, so per-gaussian live counts (for the backward's
        # segmented-scan accumulation) need no inverse permutation.
        pool = min(g, max(64, int(g * big_pool_factor)))
        big = (n_touched > dup_a) & live_g
        bigkey = jnp.where(big, jnp.int32(0), jnp.int32(1 << 30)) | (
            jnp.arange(g, dtype=jnp.int32)
        )
        big_sorted = jax.lax.sort(bigkey, dimension=0, is_stable=False)
        pool_rows = jnp.bitwise_and(
            big_sorted[:pool], jnp.int32((1 << 30) - 1)
        )                                                   # (B,)
        in_pool = big & (
            cumsum_1d(big.astype(jnp.int32), interpret=interpret) - 1
            < jnp.int32(pool)
        )
        key_b = tier_keys(pool_rows, dup_a, dup, big[pool_rows])  # (B, extra)
        # Tier-B flat ids ENCODE the source row (g*dup_a + row*extra + d')
        # so src recovery stays elementwise — no per-slot gather into the
        # pool table.  Unique across slots: pool rows are distinct.
        d2 = jnp.arange(extra, dtype=jnp.int32)[None, :]
        flat_b = g * dup_a + pool_rows[:, None] * extra + d2
        key = jnp.concatenate([key_a.reshape(-1), key_b.reshape(-1)])
        flat_all = jnp.concatenate([flat_a, flat_b.reshape(-1)])
    else:
        key = key_a.reshape(-1)
        flat_all = flat_a
    total_slots = key.shape[0]

    key_sorted, flat_sorted = jax.lax.sort(
        (key, flat_all), dimension=0, num_keys=1, is_stable=False
    )
    bound = jnp.arange(n_tiles + 1, dtype=jnp.int32) * jnp.int32(1 << row_bits)
    tile_starts = jnp.searchsorted(key_sorted, bound).astype(jnp.int32)

    budget = min(entry_budget, total_slots)
    e_pad = _cdiv(budget, chunk) * chunk + chunk  # kernel read overrun room
    starts = tile_starts[:-1]
    diff = tile_starts[1:] - tile_starts[:-1]
    # No per-tile cap: windows tile [0, n_live) contiguously.  The global
    # budget clamps boundary tiles (dropping their deepest entries).
    counts = jnp.clip(jnp.minimum(diff, jnp.int32(budget) - starts), 0)
    n_live = jnp.minimum(tile_starts[-1], jnp.int32(budget))
    # Overflow = budget drops + tier-B pool-exhaustion drops (touched tiles
    # that were never materialized because their gaussian missed the pool).
    capped_touch = jnp.sum(
        jnp.where(live_g, jnp.minimum(n_touched, dup), 0)
    )
    n_overflow = (
        jnp.maximum(tile_starts[-1] - jnp.int32(budget), 0)
        + (capped_touch - tile_starts[-1])
    )

    if e_pad <= total_slots:
        flat_p = flat_sorted[:e_pad]
    else:
        # Pad with OUT-OF-BOUNDS flat ids: the backward scatter-set uses
        # unique_indices=True + mode="drop", so padding must never collide
        # with a real flat id (a zero pad would silently clobber flat 0's
        # gradient with a zero from the dead tail).
        flat_p = jnp.concatenate(
            [
                flat_sorted,
                g * dup + jnp.arange(e_pad - total_slots, dtype=jnp.int32),
            ]
        )
    if extra > 0:
        src = jnp.where(
            flat_p < g * dup_a,
            flat_p // jnp.int32(dup_a),
            (flat_p - g * dup_a) // jnp.int32(max(extra, 1)),
        )
    else:
        src = flat_p // jnp.int32(dup_a)
    # Source-order permutation for the backward's scatter-free reduction
    # (see PrefixBins.src_order).  Positions >= n_live — dead slots,
    # budget-dropped entries, AND out-of-range padding — are clamped to
    # segment g so they sink to the tail: the permuted stream's live
    # prefix then consists of exactly the kept entries, grouped by
    # source gaussian.  One e_pad-sized (key, payload) sort in the
    # FORWARD buys the backward out of the 2M-flat-space scatter.
    pos = jnp.arange(e_pad, dtype=jnp.int32)
    src_stream = jnp.where(
        pos < n_live, jnp.minimum(src, jnp.int32(g)), jnp.int32(g)
    )
    src_sorted, src_order = jax.lax.sort(
        (src_stream, pos), dimension=0, num_keys=1, is_stable=False,
    )
    # Analytic kept-live entry counts per gaussian (exact when the budget
    # dropped nothing): tier-A min(touched, dup_a) + tier-B extras for
    # pool members.  Their cumsum gives each gaussian's segment END in
    # the permuted stream — the backward reads the segmented-scan value
    # there.  has_drops flags the (rare, budget-overflow) case where the
    # stream no longer matches and the backward must fall back.
    cap_a = jnp.minimum(n_touched, jnp.int32(dup_a))
    if extra > 0:
        live_counts = jnp.where(
            live_g,
            cap_a + jnp.where(
                in_pool,
                jnp.clip(n_touched - jnp.int32(dup_a), 0, extra), 0,
            ),
            0,
        ).astype(jnp.int32)
    else:
        live_counts = jnp.where(live_g, cap_a, 0).astype(jnp.int32)
    ends = cumsum_1d(live_counts, interpret=interpret)
    has_drops = tile_starts[-1] > jnp.int32(budget)
    return PrefixBins(
        flat_p, src, counts, starts, n_live, (tiles_y, tiles_x), e_pad, dup,
        n_overflow, dup_a, src_order, src_sorted,
        live_counts, ends, has_drops,
    )


def composite_tiles(
    proj: ProjectedGaussians,
    bins: TileBins,
    image_shape: tuple[int, int],
    background: jax.Array,
    max_per_tile: int = 2048,
    chunk: int = 128,
):
    """Composite all tiles. Returns (color (h, w, 3), depth (h, w), alpha (h, w))."""
    h, w = image_shape
    tiles_y, tiles_x = bins.num_tiles_xy
    n_tiles = tiles_y * tiles_x
    dtype = proj.xy.dtype

    depth_safe = jnp.where(jnp.isfinite(proj.depth), proj.depth, 0.0)
    # Packed per-gaussian attributes + one trailing dummy row for padding.
    packed = jnp.concatenate(
        [
            proj.xy,                      # 0:2
            proj.conic,                   # 2:5
            proj.color,                   # 5:8
            proj.opacity[:, None],        # 8
            depth_safe[:, None],          # 9
        ],
        axis=-1,
    )
    if bins.order is not None:
        # ids_sorted indexes depth-permuted rows (see bin_gaussians); one
        # 131k-row gather here replaces a per-entry payload stream in the
        # binning sort.  Differentiable (VJP is a scatter over g rows).
        packed = packed[bins.order]
    dummy = jnp.zeros((1, packed.shape[-1]), dtype=packed.dtype)
    dummy = dummy.at[0, 0:2].set(jnp.asarray([-1e9, -1e9], dtype=packed.dtype))
    packed = jnp.concatenate([packed, dummy], axis=0)
    n_gauss = proj.xy.shape[0]

    ids_padded = jnp.concatenate(
        [bins.ids_sorted, jnp.full((max_per_tile,), n_gauss, jnp.int32)]
    )

    # Per-tile pixel coordinates (integer-center convention).
    dyx = jnp.arange(TILE, dtype=dtype)
    py, px = jnp.meshgrid(dyx, dyx, indexing="ij")
    local_pix = jnp.stack([px.reshape(-1), py.reshape(-1)], axis=-1)  # (P, 2)

    n_chunks = _cdiv(max_per_tile, chunk)

    def render_tile(tile_idx, start, count):
        ty = tile_idx // tiles_x
        tx = tile_idx % tiles_x
        origin = jnp.stack([tx * TILE, ty * TILE]).astype(dtype)
        pix = local_pix + origin[None, :]

        window = jax.lax.dynamic_slice(ids_padded, (start,), (max_per_tile,))
        k_valid = jnp.minimum(count, max_per_tile)
        window = jnp.where(
            jnp.arange(max_per_tile) < k_valid, window, n_gauss
        )
        window = window.reshape(n_chunks, chunk)

        def step(carry, ids):
            t_carry, color_acc, depth_acc = carry
            attrs = packed[ids]  # (chunk, 10)
            alpha = alpha_from_conic(
                attrs[:, 0:2], attrs[:, 2:5], attrs[:, 8], pix
            )  # (P, chunk)
            om = 1.0 - alpha
            cp = jnp.cumprod(om, axis=-1)
            t_incl = t_carry[:, None] * cp
            composited = jax.lax.stop_gradient(t_incl) >= T_EPS
            cp_excl = jnp.concatenate(
                [jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=-1
            )
            weight = jnp.where(composited, alpha * t_carry[:, None] * cp_excl, 0.0)
            hi = jax.lax.Precision.HIGHEST
            color_acc = color_acc + jnp.matmul(weight, attrs[:, 5:8], precision=hi)
            depth_acc = depth_acc + jnp.matmul(weight, attrs[:, 9], precision=hi)
            t_carry = t_carry * jnp.prod(
                jnp.where(composited, om, 1.0), axis=-1
            )
            return (t_carry, color_acc, depth_acc), None

        init = (
            jnp.ones((PIX_PER_TILE,), dtype),
            jnp.zeros((PIX_PER_TILE, 3), dtype),
            jnp.zeros((PIX_PER_TILE,), dtype),
        )
        (t_final, color, depth), _ = jax.lax.scan(
            jax.checkpoint(step), init, window
        )
        color = color + t_final[:, None] * background[None, :]
        return color, depth, 1.0 - t_final

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    starts = bins.tile_starts[:-1]
    counts = bins.tile_starts[1:] - bins.tile_starts[:-1]
    color, depth, alpha = jax.vmap(render_tile)(tile_ids, starts, counts)

    def untile(x):
        c = x.shape[-1] if x.ndim == 3 else 1
        x = x.reshape(tiles_y, tiles_x, TILE, TILE, c)
        x = x.transpose(0, 2, 1, 3, 4).reshape(tiles_y * TILE, tiles_x * TILE, c)
        return x[:h, :w]

    return (
        untile(color),
        untile(depth[..., None])[..., 0],
        untile(alpha[..., None])[..., 0],
    )


@partial(
    jax.jit,
    static_argnames=("image_shape", "sh_degree", "use_sh",
                     "max_tiles_per_gaussian", "max_per_tile", "chunk"),
)
def rasterize_tiled(
    means,
    covariances,
    harmonics,
    opacities,
    c2w,
    intrinsics,
    background,
    image_shape: tuple[int, int],
    sh_degree: int | None = None,
    use_sh: bool = True,
    max_tiles_per_gaussian: int = 16,
    max_per_tile: int = 2048,
    chunk: int = 128,
):
    """Single-camera tiled rasterization: project + bin + composite."""
    from spfsplatv2_tpu.ops.raster_common import project_gaussians

    proj = project_gaussians(
        means, covariances, harmonics, opacities, c2w, intrinsics,
        image_shape, sh_degree=sh_degree, use_sh=use_sh,
    )
    bins = bin_gaussians(proj, image_shape, max_tiles_per_gaussian)
    return composite_tiles(
        proj, bins, image_shape, background,
        max_per_tile=max_per_tile, chunk=chunk,
    )
