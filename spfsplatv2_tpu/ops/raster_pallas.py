"""Hand-written Pallas TPU kernels for per-tile Gaussian compositing.

This is the TPU-native replacement for the hot inner loops of the reference
CUDA rasterizer (`diff_gauss_pose` renderCUDA forward/backward; call surface
reference src/model/decoder/cuda_splatting.py:45-144). The surrounding
stages (EWA projection, duplicate-and-sort binning) stay in XLA
(raster_common.py / raster_tiled.py) — dense, fast, differentiable there;
the kernels here replace only the per-tile front-to-back blending, which
XLA schedules poorly.

Data layout (chosen for Mosaic DMA alignment): depth-sorted per-tile entry
attributes are pre-gathered into a TRANSPOSED buffer `attrs_t (FEAT, E_cap)`
with rows [mx, my, conic_a, conic_b, conic_c, r, g, b, opacity, depth, ...];
each tile's segment is padded to a multiple of the kernel chunk so every DMA
reads a (FEAT, chunk) block at a chunk-aligned column offset. Field rows are
then directly the (1, chunk) broadcast vectors the math needs — no in-kernel
reshapes or transposes. The invalid-tile sentinel tail of the sort never
enters the buffer (E_cap = n_tiles * max_per_tile).

Forward kernel (grid = tiles): double-buffered DMA of entry chunks
HBM -> VMEM; per chunk a (256 pixels x chunk) alpha matrix on the VPU; the
front-to-back recurrence closes with a log-space prefix sum along the chunk
axis (Mosaic has no cumsum — built from pltpu.roll shifts); color/depth
accumulate as MXU contractions; the loop exits early once every pixel's
transmittance passes the 1e-4 stop (exact CUDA break semantics — an entry
is composited iff T stays >= 1e-4).

Backward kernel: re-traverses entries front-to-back and converts output
cotangents into per-ENTRY gradients with the suffix identity
  dL/d(alpha_i) = T_i * u_i - S_i / (1 - alpha_i),
  S_i = phi - sum_{j<=i} w_j u_j,  phi = C.gC + D.gD - T_fin.gA,
so no back-to-front traversal or atomics are needed (the CUDA backward uses
atomics; the forward-prefix formulation keeps everything dense). Per-entry
gradients land in exclusive slots of `dattrs_t`, are permuted into
source-gaussian order with the binning's precomputed src_order (a gather),
and reduced per gaussian with a sorted segment-sum — scatters are banned
from the backward (~110 ns/index on v5e vs ~17 ns gathers; see
benchmarks/scatter_alternatives_probe.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spfsplatv2_tpu.ops.raster_common import (
    ALPHA_MAX,
    ALPHA_MIN,
    T_EPS,
    ProjectedGaussians,
)
from spfsplatv2_tpu.ops.raster_tiled import TILE, PIX_PER_TILE, TileBins

FEAT = 16  # padded field count (10 used)


def _prefix_sum_lanes(x: jax.Array, n: int) -> jax.Array:
    """Inclusive prefix sum along the last (lane) axis via log2(n) shifts.

    Mosaic has no cumsum lowering; built from pltpu.roll + masking.
    """
    assert n & (n - 1) == 0, f"chunk size {n} must be a power of two"
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    k = 1
    while k < n:
        shifted = pltpu.roll(x, k, axis=x.ndim - 1)
        x = x + jnp.where(lane >= k, shifted, 0.0)
        k *= 2
    return x


def _prefix_prod_lanes(x: jax.Array, n: int) -> jax.Array:
    """Inclusive prefix product along the lane axis (roll + select)."""
    assert n & (n - 1) == 0, f"chunk size {n} must be a power of two"
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    k = 1
    while k < n:
        shifted = pltpu.roll(x, k, axis=x.ndim - 1)
        x = x * jnp.where(lane >= k, shifted, 1.0)
        k *= 2
    return x


def _pixel_grid(tile_idx, tiles_x, dtype=jnp.float32):
    """TILE-LOCAL pixel coordinates (P, 1) plus the tile origin (1, 1).

    All kernel math runs in tile-local coordinates: the Gaussian exponent
    and its gradients are translation invariant, and local magnitudes
    (|x| < 16, |mx_local| ~ radius) keep the f32 moment formulation in the
    backward kernel free of catastrophic cancellation (global coords would
    put mx^2 ~ 2.5e5 against dx^2 ~ 1e2).
    """
    ty = (tile_idx // tiles_x).astype(dtype)
    tx = (tile_idx % tiles_x).astype(dtype)
    local_y = jax.lax.broadcasted_iota(jnp.int32, (PIX_PER_TILE, 1), 0) // TILE
    local_x = jax.lax.broadcasted_iota(jnp.int32, (PIX_PER_TILE, 1), 0) % TILE
    px = local_x.astype(dtype)
    py = local_y.astype(dtype)
    ox = (tx * TILE).reshape(1, 1)
    oy = (ty * TILE).reshape(1, 1)
    return px, py, ox, oy


def _pixel_basis(px, py):
    """Quadratic pixel basis (PIX_PER_TILE, 8): [x2, y2, xy, x, y, 1, 0, 0].

    The per-pixel-per-entry Gaussian exponent is then ONE MXU contraction
    `basis @ qmat` instead of ~10 VPU ops per (pixel, entry).
    """
    ones = jnp.ones_like(px)
    zeros = jnp.zeros_like(px)
    return jnp.concatenate(
        [px * px, py * py, px * py, px, py, ones, zeros, zeros], axis=1
    )


def _local_means(attrs, ox, oy):
    return attrs[0:1, :] - ox, attrs[1:2, :] - oy


def _chunk_alpha(attrs, basis, valid, ox, oy):
    """attrs (FEAT, chunk); basis (P, 8); valid (1, chunk) -> alpha (P, chunk).

    power(p, e) = -0.5 (a dx^2 + c dy^2) - b dx dy expanded into the pixel
    basis: coefficients [-a/2, -c/2, -b, a mx + b my, c my + b mx, const]
    so the MXU computes the (P, chunk) exponent matrix.
    """
    mx, my = _local_means(attrs, ox, oy)
    ca = attrs[2:3, :]
    cb = attrs[3:4, :]
    cc = attrs[4:5, :]
    op = attrs[8:9, :]
    zeros = jnp.zeros_like(mx)
    qmat = jnp.concatenate(
        [
            -0.5 * ca,
            -0.5 * cc,
            -cb,
            ca * mx + cb * my,
            cc * my + cb * mx,
            -0.5 * (ca * mx * mx + cc * my * my) - cb * mx * my,
            zeros,
            zeros,
        ],
        axis=0,
    )  # (8, chunk)
    # HIGHEST precision: the v5e MXU runs f32 matmuls as bf16x3 passes by
    # default, and power errors of ~1e-2 at large tile-local coordinates
    # flip entries across the ALPHA_MIN / power<=0 cutoffs — compiled-TPU
    # images then diverge from the oracle by O(1) at the flipped entries
    # (round-5 cross-check).  Only THIS contraction gates discrete
    # decisions; the remaining dots are plain accumulations where bf16x3
    # error is ~1e-6 relative, so they keep the fast default.
    power = jax.lax.dot_general(
        basis, qmat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (P, chunk)
    alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
    keep = (power <= 0.0) & (alpha >= ALPHA_MIN) & valid
    return jnp.where(keep, alpha, 0.0)


def _composite_chunk(attrs, basis, valid, t_carry, chunk, ox, oy):
    """Shared forward-recurrence math (multiplicative prefix scan)."""
    alpha = _chunk_alpha(attrs, basis, valid, ox, oy)
    om = 1.0 - alpha
    t_incl = t_carry * _prefix_prod_lanes(om, chunk)
    composited = t_incl >= T_EPS
    t_excl = jnp.concatenate([t_carry, t_incl[:, :-1]], axis=1)
    w = jnp.where(composited, alpha * t_excl, 0.0)
    # t_incl is non-increasing along lanes and `composited` is a prefix, so
    # the carry update t * prod(om over composited lanes) equals the last
    # composited t_incl — a min-reduce (Mosaic has no product reduction).
    t_new = jnp.min(
        jnp.where(composited, t_incl, t_carry), axis=1, keepdims=True
    )
    return alpha, w, t_excl, composited, t_new


def _forward_kernel(
    counts_ref,      # SMEM (n_tiles,) REAL entry counts
    starts_ref,      # SMEM (n_tiles,) chunk-aligned segment starts
    basis_ref,       # VMEM (PIX_PER_TILE, 8) constant pixel basis
    attrs_hbm,       # ANY (FEAT, E_cap)
    out_ref,         # VMEM (1, PIX_PER_TILE, 8)
    scratch,         # VMEM (2, FEAT, chunk)
    sems,            # DMA sems (2,)
    *,
    chunk: int,
    tiles_x: int,
    max_per_tile: int,
    tiles_per_cam: int,
    unaligned: bool = False,
):
    t = pl.program_id(0)
    # Segment starts are data (ragged chunk-aligned layout), fixed-stride
    # t * max_per_tile (padded layout), or ARBITRARY (prefix layout,
    # unaligned=True) — all arrive via scalar prefetch.  The prefix layout
    # DMAs from the 128-aligned floor and masks the head lanes.
    start = starts_ref[t]
    count = counts_ref[t]
    if unaligned:
        # Alignment granularity: 128 lanes for compiled DMA; `chunk` when
        # chunk < 128 (interpret-mode tests) so the unaligned head always
        # fits inside the FIRST chunk — the boundary merge below assumes
        # head < chunk.
        align = 128 if chunk % 128 == 0 else chunk
        aligned = (start // align) * align
        head = start - aligned
    else:
        aligned = start
        head = jnp.int32(0)
    n_ch = pl.cdiv(head + count, chunk)

    # Multi-camera grids concatenate each camera's tiles; pixel coords
    # depend only on the within-camera tile index.  The quadratic pixel
    # basis is tile-local (translation handled via ox/oy in the qmat), so
    # it arrives as a CONSTANT input block instead of being rebuilt from
    # narrow (P, 1) iota pieces every grid step.
    _, _, ox, oy = _pixel_grid(jax.lax.rem(t, tiles_per_cam), tiles_x)
    basis = basis_ref[...]

    def dma(slot, c):
        offset = pl.multiple_of(aligned + c * chunk, 128)
        return pltpu.make_async_copy(
            attrs_hbm.at[:, pl.ds(offset, chunk)],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(n_ch > 0)
    def _():
        dma(0, 0).start()

    def body(carry):
        c, t_carry, t_max, color, depth = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_ch)
        def _():
            dma(jax.lax.rem(c + 1, 2), c + 1).start()

        dma(slot, c).wait()
        attrs = scratch[slot]
        entry_idx = c * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (1, chunk), 1
        )
        valid = (entry_idx >= head) & (entry_idx < head + count)
        alpha, w, _, _, t_carry = _composite_chunk(
            attrs, basis, valid, t_carry, chunk, ox, oy
        )
        # color += w @ rgb^T ; depth += w @ z^T  (contract the chunk axis).
        # HIGHEST: forward image accuracy (bf16x3 passes leave ~5e-3
        # outliers vs the oracle); the backward's dots keep the fast
        # default — their ~1e-6-relative error is dwarfed by inherent
        # cutoff-flip gradient differences (PERFORMANCE.md round 5).
        cd = attrs[5:13, :]  # rows: r g b op z pad pad pad
        contrib = jax.lax.dot_general(
            w, cd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (P, 8)
        color = color + contrib[:, 0:3]
        depth = depth + contrib[:, 4:5]
        return c + 1, t_carry, jnp.max(t_carry), color, depth

    def cond(carry):
        # Scalar-only condition: the vector max lives in the body (where
        # it overlaps other work) so the loop header never pays a
        # vector->scalar sync, and empty tiles skip it entirely.
        c, _, t_max, _, _ = carry
        return (c < n_ch) & (t_max >= T_EPS)

    init = (
        jnp.zeros((), jnp.int32),
        jnp.ones((PIX_PER_TILE, 1), jnp.float32),
        jnp.ones((), jnp.float32),
        jnp.zeros((PIX_PER_TILE, 3), jnp.float32),
        jnp.zeros((PIX_PER_TILE, 1), jnp.float32),
    )
    _, t_fin, _, color, depth = jax.lax.while_loop(cond, body, init)

    out_ref[0, :, 0:3] = color
    out_ref[0, :, 3:4] = depth
    out_ref[0, :, 4:5] = 1.0 - t_fin
    out_ref[0, :, 5:6] = t_fin
    out_ref[0, :, 6:8] = jnp.zeros((PIX_PER_TILE, 2), jnp.float32)


def _backward_kernel(
    counts_ref,      # SMEM (n_tiles,)
    starts_ref,      # SMEM (n_tiles,)
    basis_ref,       # VMEM (PIX_PER_TILE, 8) constant pixel basis
    attrs_hbm,       # ANY (FEAT, E_cap)
    fwd_out_ref,     # VMEM (1, PIX_PER_TILE, 8)
    grads_ref,       # VMEM (1, PIX_PER_TILE, 8)
    dattrs_init_hbm,  # ANY (FEAT, E_cap) pre-zeroed, aliased to the output
    dattrs_hbm,      # OUT ANY (FEAT, E_cap)
    scratch,         # VMEM (2, FEAT, chunk)
    dscratch,        # VMEM (FEAT, chunk)
    rmw_scratch,     # VMEM (FEAT, chunk) existing-block buffer for merges
    sems,            # DMA sems (2,)
    outsem,          # DMA sem
    rmw_sem,         # DMA sem
    *,
    chunk: int,
    tiles_x: int,
    max_per_tile: int,
    tiles_per_cam: int,
    unaligned: bool = False,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    if unaligned:
        # Alignment granularity: 128 lanes for compiled DMA; `chunk` when
        # chunk < 128 (interpret-mode tests) so the unaligned head always
        # fits inside the FIRST chunk — the boundary merge below assumes
        # head < chunk.
        align = 128 if chunk % 128 == 0 else chunk
        aligned = (start // align) * align
        head = start - aligned
    else:
        aligned = start
        head = jnp.int32(0)
    # Write every VISITED chunk of this segment (the output buffer is a
    # pre-ZEROED input aliased onto the output, so unvisited chunks —
    # early exit, alignment padding, dead tail — already hold zeros and
    # need no zero-fill DMA loop).  Aligned-layout segments are disjoint,
    # so slots stay exclusive.  The UNALIGNED prefix layout shares its
    # boundary 128-lane blocks with neighbouring tiles: the first chunk
    # (when head > 0) read-modify-writes, merging computed values into
    # the block the PREVIOUS tile already wrote (TPU grid steps run
    # sequentially on one core, so the ordering is guaranteed), and tail
    # lanes are written zero for the NEXT tile to merge over.
    n_ch = pl.cdiv(head + count, chunk)

    _, _, ox, oy = _pixel_grid(jax.lax.rem(t, tiles_per_cam), tiles_x)
    basis = basis_ref[...]

    g_c = grads_ref[0, :, 0:3]
    g_d = grads_ref[0, :, 3:4]
    g_a = grads_ref[0, :, 4:5]
    color_out = fwd_out_ref[0, :, 0:3]
    depth_out = fwd_out_ref[0, :, 3:4]
    t_fin = fwd_out_ref[0, :, 5:6]

    phi = (
        jnp.sum(color_out * g_c, axis=1, keepdims=True)
        + depth_out * g_d
        - t_fin * g_a
    )

    def dma(slot, c):
        offset = pl.multiple_of(aligned + c * chunk, 128)
        return pltpu.make_async_copy(
            attrs_hbm.at[:, pl.ds(offset, chunk)],
            scratch.at[slot],
            sems.at[slot],
        )

    def write_out(c):
        offset = pl.multiple_of(aligned + c * chunk, 128)
        is_merge = jnp.zeros((), jnp.bool_)
        if unaligned:
            # Boundary merge: the first chunk's pre-head lanes hold the
            # previous tiles' already-written gradients — preserve them
            # (the merge goes through rmw_scratch so dscratch is never
            # mutated: the zero-fill loop reuses it across chunks).
            is_merge = (c == 0) & (head > 0)

            @pl.when(is_merge)
            def _():
                rd = pltpu.make_async_copy(
                    dattrs_hbm.at[:, pl.ds(offset, chunk)],
                    rmw_scratch,
                    rmw_sem,
                )
                rd.start()
                rd.wait()
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
                win = (lane >= head) & (lane < head + count)
                rmw_scratch[:, :] = jnp.where(
                    win, dscratch[:, :], rmw_scratch[:, :]
                )
                out_dma = pltpu.make_async_copy(
                    rmw_scratch,
                    dattrs_hbm.at[:, pl.ds(offset, chunk)],
                    outsem,
                )
                out_dma.start()
                out_dma.wait()

        @pl.when(jnp.logical_not(is_merge))
        def _():
            out_dma = pltpu.make_async_copy(
                dscratch,
                dattrs_hbm.at[:, pl.ds(offset, chunk)],
                outsem,
            )
            out_dma.start()
            out_dma.wait()

    @pl.when(n_ch > 0)
    def _():
        dma(0, 0).start()

    # Pad rows 10:16 are constant zero; written once, not per chunk.
    dscratch[NUM_FIELDS:FEAT, :] = jnp.zeros(
        (FEAT - NUM_FIELDS, chunk), jnp.float32
    )

    gcat = jnp.concatenate(
        [g_c, jnp.zeros_like(g_d), g_d,
         jnp.zeros((PIX_PER_TILE, 3), jnp.float32)],
        axis=1,
    )  # (P, 8) matching cd rows r g b op z pad pad pad

    def body(carry):
        c, t_carry, t_max, s_rem = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_ch)
        def _():
            dma(jax.lax.rem(c + 1, 2), c + 1).start()

        dma(slot, c).wait()
        attrs = scratch[slot]
        entry_idx = c * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (1, chunk), 1
        )
        valid = (entry_idx >= head) & (entry_idx < head + count)
        alpha, w, t_excl, composited, t_new = _composite_chunk(
            attrs, basis, valid, t_carry, chunk, ox, oy
        )

        # u_i(p) = rgb_i . gC(p) + z_i gD(p): contract the field axis.
        cd = attrs[5:13, :]
        u = jax.lax.dot_general(
            gcat, cd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, chunk)

        wu = w * u
        prefix_incl = _prefix_sum_lanes(wu, chunk)
        s_before = s_rem - (prefix_incl - wu)
        one_minus = jnp.maximum(1.0 - alpha, 1e-6)
        dalpha = jnp.where(
            composited, t_excl * u - (s_before - wu) / one_minus, 0.0
        )

        dpow = alpha * dalpha
        clamped = alpha >= ALPHA_MAX
        dpow = jnp.where(clamped, 0.0, dpow)
        op = jnp.maximum(attrs[8:9, :], 1e-9)

        mx, my = _local_means(attrs, ox, oy)
        ca = attrs[2:3, :]
        cb = attrs[3:4, :]
        cc = attrs[4:5, :]

        # All pixel-polynomial gradient sums via ONE moment contraction:
        # M_k(e) = sum_p dpow(p, e) * basis_k(p), basis = [x2 y2 xy x y 1..].
        mom = jax.lax.dot_general(
            basis, dpow, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (8, chunk)
        m_xx = mom[0:1, :]
        m_yy = mom[1:2, :]
        m_xy = mom[2:3, :]
        m_x = mom[3:4, :]
        m_y = mom[4:5, :]
        m_1 = mom[5:6, :]
        # dx-centered moments: sum dpow*dx = m_x - mx*m_1, etc.
        sx = m_x - mx * m_1
        sy = m_y - my * m_1
        sxx = m_xx - 2.0 * mx * m_x + mx * mx * m_1
        syy = m_yy - 2.0 * my * m_y + my * my * m_1
        sxy = m_xy - mx * m_y - my * m_x + mx * my * m_1
        d_mx = ca * sx + cb * sy
        d_my = cc * sy + cb * sx
        d_ca = -0.5 * sxx
        d_cb = -sxy
        d_cc = -0.5 * syy
        # d_op = sum_p (alpha/op) dalpha (unclamped entries) = M_1 / op.
        d_op = m_1 / op
        # dcolor rows (3, chunk) and ddepth row: contract the pixel axis.
        d_col = jax.lax.dot_general(
            g_c, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (3, chunk)
        d_dep = jax.lax.dot_general(
            g_d, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, chunk)

        vmask = valid.astype(jnp.float32)
        dscratch[0:1, :] = d_mx * vmask
        dscratch[1:2, :] = d_my * vmask
        dscratch[2:3, :] = d_ca * vmask
        dscratch[3:4, :] = d_cb * vmask
        dscratch[4:5, :] = d_cc * vmask
        dscratch[5:8, :] = d_col * vmask
        dscratch[8:9, :] = d_op * vmask
        dscratch[9:10, :] = d_dep * vmask
        write_out(c)

        s_rem = s_rem - jnp.sum(wu, axis=1, keepdims=True)
        return c + 1, t_new, jnp.max(t_new), s_rem

    def cond(carry):
        # Scalar-only condition (see _forward_kernel).
        c, _, t_max, _ = carry
        return (c < n_ch) & (t_max >= T_EPS)

    jax.lax.while_loop(
        cond,
        body,
        (jnp.zeros((), jnp.int32), jnp.ones((PIX_PER_TILE, 1), jnp.float32),
         jnp.ones((), jnp.float32), phi),
    )
    # Unvisited chunks (early exit / alignment padding / dead tail) keep
    # the pre-zeroed aliased buffer's zeros — no zero-fill loop.


def _fwd_call(attrs_t, counts, starts, num_tiles_xy, chunk,
              max_per_tile, interpret, n_cam, unaligned=False):
    tiles_y, tiles_x = num_tiles_xy
    n_tiles = tiles_y * tiles_x
    kernel = functools.partial(_forward_kernel, chunk=chunk, tiles_x=tiles_x,
                               max_per_tile=max_per_tile,
                               tiles_per_cam=n_tiles, unaligned=unaligned)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_cam * n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (PIX_PER_TILE, 8), lambda t, c, s: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, PIX_PER_TILE, 8), lambda t, c, s: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, FEAT, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    px, py, _, _ = _pixel_grid(jnp.zeros((), jnp.int32), tiles_x)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_cam * n_tiles, PIX_PER_TILE, 8), jnp.float32
        ),
        interpret=interpret,
    )(counts, starts, _pixel_basis(px, py), attrs_t)


def _bwd_call(attrs_t, counts, starts, fwd_out, g, num_tiles_xy, chunk,
              max_per_tile, interpret, n_cam, padded_capacity=False,
              unaligned=False):
    # padded_capacity is accepted for probe-API compat and ignored: the
    # output is a pre-zeroed aliased buffer, so capacity zero-fill is gone.
    del padded_capacity
    tiles_y, tiles_x = num_tiles_xy
    n_tiles = tiles_y * tiles_x
    grads = jnp.concatenate(
        [g[..., 0:3], g[..., 3:4], g[..., 4:5], jnp.zeros_like(g[..., 5:8])],
        axis=-1,
    )
    kernel = functools.partial(_backward_kernel, chunk=chunk, tiles_x=tiles_x,
                               max_per_tile=max_per_tile,
                               tiles_per_cam=n_tiles,
                               unaligned=unaligned)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_cam * n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (PIX_PER_TILE, 8), lambda t, c, s: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (1, PIX_PER_TILE, 8), lambda t, c, s: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, PIX_PER_TILE, 8), lambda t, c, s: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, FEAT, chunk), jnp.float32),
            pltpu.VMEM((FEAT, chunk), jnp.float32),
            pltpu.VMEM((FEAT, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    px, py, _, _ = _pixel_grid(jnp.zeros((), jnp.int32), tiles_x)
    # The pre-zeroed gradient buffer is input 6 (indices count the scalar-
    # prefetch args), aliased onto output 0: unvisited chunks keep zeros.
    dattrs_init = jnp.zeros(attrs_t.shape, jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(attrs_t.shape, jnp.float32),
        interpret=interpret,
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(counts, starts, _pixel_basis(px, py), attrs_t, fwd_out, grads,
      dattrs_init)


NUM_FIELDS = 10  # real attribute fields (xy conic rgb opacity depth)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15))
def _prefix_core(packed, flat_p, src, src_order, src_sorted, live_counts,
                 ends, has_drops, counts, starts, n_live, num_tiles_xy,
                 chunk, interpret, dup, base_dup):
    """Gather + composite over the prefix entry layout (see PrefixBins).

    The gather lives INSIDE this custom-VJP boundary so the backward pass
    accumulates per-entry gradients scatter-free: permute-gather into
    source order, then a Pallas SEGMENTED SCAN whose per-segment last
    lane is read at the binning's precomputed segment ends (~0.3 ms vs
    2.3 ms for XLA's sorted segment-sum, which lowers to a scatter-add;
    benchmarks/r5_accum_ab.py).  Budget-overflow steps (has_drops) fall
    back to segment_sum, whose correctness doesn't depend on the
    analytic segment ends.
    """
    e_pad = flat_p.shape[0]
    rows = packed[src]                                  # (e_pad, NUM_FIELDS)
    attrs_t = jnp.concatenate(
        [rows.T, jnp.zeros((FEAT - NUM_FIELDS, e_pad), packed.dtype)], axis=0
    )
    return _fwd_call(attrs_t, counts, starts, num_tiles_xy, chunk,
                     e_pad, interpret, 1, unaligned=True)


def _prefix_core_fwd(packed, flat_p, src, src_order, src_sorted, live_counts,
                     ends, has_drops, counts, starts, n_live, num_tiles_xy,
                     chunk, interpret, dup, base_dup):
    e_pad = flat_p.shape[0]
    rows = packed[src]
    attrs_t = jnp.concatenate(
        [rows.T, jnp.zeros((FEAT - NUM_FIELDS, e_pad), packed.dtype)], axis=0
    )
    out = _fwd_call(attrs_t, counts, starts, num_tiles_xy, chunk,
                    e_pad, interpret, 1, unaligned=True)
    return out, (packed, src_order, src_sorted, live_counts, ends,
                 has_drops, attrs_t, counts, starts, n_live, out)


def _prefix_core_bwd(num_tiles_xy, chunk, interpret, dup, base_dup,
                     residuals, g):
    from spfsplatv2_tpu.ops.segscan import segmented_scan_lanes

    (packed, src_order, src_sorted, live_counts, ends, has_drops, attrs_t,
     counts, starts, n_live, fwd_out) = residuals
    n_gauss = packed.shape[0]
    e_pad = attrs_t.shape[1]
    dattrs_t = _bwd_call(attrs_t, counts, starts, fwd_out, g, num_tiles_xy,
                         chunk, e_pad, interpret, 1, unaligned=True)
    # Windows tile [0, n_live) contiguously, so backward validity is ONE
    # suffix mask (slots past n_live were never written — garbage).
    # ALL gathers run in ROW space: gathering along the LANE axis of a
    # row-major (16, E) buffer fetches 16 strided words per index (~an
    # order of magnitude over a contiguous 64-byte row; measured as a
    # +1.8 ms/camera regression in r5_dissect4).
    live = (jnp.arange(e_pad, dtype=jnp.int32) < n_live)[:, None]
    drows = jnp.where(live, dattrs_t[:NUM_FIELDS].T, 0.0)  # (e_pad, 10)
    # Permute entries into source-gaussian order (dead/dropped positions
    # were clamped to segment n_gauss in the binning; their rows are 0).
    drows_s = drows[src_order]                             # (e_pad, 10)

    if ACCUM_MODE == "segscan":
        def fast(_):
            # Segmented inclusive scan along lanes: each segment's LAST
            # lane carries its sum; read it at the analytic segment ends.
            perm_t = jnp.concatenate(
                [drows_s.T,
                 jnp.zeros((FEAT - NUM_FIELDS, e_pad), drows_s.dtype)],
                axis=0,
            )
            scanned = segmented_scan_lanes(
                perm_t, src_sorted, block=chunk, interpret=interpret
            )
            seg_rows = scanned[:NUM_FIELDS].T              # (e_pad, 10)
            take_pos = jnp.clip(ends - 1, 0, e_pad - 1)
            return jnp.where(
                (live_counts > 0)[:, None], seg_rows[take_pos], 0.0
            )

        def slow(_):
            # Budget overflow dropped live entries: the analytic ends no
            # longer match the stream — fall back to XLA's segment-sum.
            return jax.ops.segment_sum(
                drows_s, src_sorted, num_segments=n_gauss + 1,
                indices_are_sorted=True,
            )[:n_gauss]

        dpacked = jax.lax.cond(has_drops, slow, fast, None)
    else:
        dpacked = jax.ops.segment_sum(
            drows_s, src_sorted, num_segments=n_gauss + 1,
            indices_are_sorted=True,
        )[:n_gauss]
    return (dpacked,) + (None,) * 10


# Backward accumulation strategy: "segsum" (XLA sorted segment-sum, the
# round-4 design) or "segscan" (Pallas segmented scan + analytic-ends
# read).  Env-overridable so probes can A/B it without edits; the
# production default is whichever the in-context measurement wins
# (benchmarks/r5_accum_ab.py / r5_dissect.py).
import os as _os  # noqa: E402

ACCUM_MODE = _os.environ.get("SPFSPLAT_ACCUM", "segsum")


_prefix_core.defvjp(_prefix_core_fwd, _prefix_core_bwd)


def composite_pallas_prefix(
    proj: ProjectedGaussians,
    bins,                         # raster_tiled.PrefixBins
    image_shape: tuple[int, int],
    background: jax.Array,
    chunk: int = 256,
    interpret: bool | None = None,
):
    """Compositing over the prefix entry layout (fastest path).

    vs the retired compact layout: no slot re-packing stage (the sort's live
    prefix is the slot space; kernels mask unaligned heads), ~25% fewer
    gather/scatter indices (no per-tile alignment slack), and the backward
    accumulation is scatter-set + dense sum instead of scatter-add.
    """
    h, w = image_shape
    tiles_y, tiles_x = bins.num_tiles_xy
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not interpret:
        assert chunk % 128 == 0, "compiled kernels need chunk % 128 == 0"

    depth_safe = jnp.where(jnp.isfinite(proj.depth), proj.depth, 0.0)
    xy_safe = jnp.where(jnp.isfinite(proj.xy), proj.xy, 0.0)
    packed = jnp.concatenate(
        [
            xy_safe,                    # 0:2
            proj.conic,                 # 2:5
            proj.color,                 # 5:8
            proj.opacity[:, None],      # 8
            depth_safe[:, None],        # 9
        ],
        axis=-1,
    )                                   # (g, NUM_FIELDS)

    out = _prefix_core(
        packed, bins.flat, bins.src, bins.src_order, bins.src_sorted,
        bins.live_counts, bins.ends, bins.has_drops,
        bins.counts, bins.starts, bins.n_live,
        (tiles_y, tiles_x), chunk, interpret, bins.dup,
        bins.base_dup or bins.dup,
    )  # (n_tiles, P, 8)

    color_t = out[..., 0:3] + out[..., 5:6] * background[None, None, :]
    depth_t = out[..., 3]
    alpha_t = out[..., 4]

    def untile(x):
        c = x.shape[-1] if x.ndim == 3 else 1
        x = x.reshape(tiles_y, tiles_x, TILE, TILE, c)
        x = x.transpose(0, 2, 1, 3, 4).reshape(tiles_y * TILE, tiles_x * TILE, c)
        return x[:h, :w]

    return (
        untile(color_t),
        untile(depth_t[..., None])[..., 0],
        untile(alpha_t[..., None])[..., 0],
    )
