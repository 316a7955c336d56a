"""Pallas segmented inclusive scan along the lane axis.

TPU-native building block for the rasterizer's backward accumulation
(replaces `jax.ops.segment_sum`, which lowers to a scatter-add at ~9
ns/index — 2.3 ms/camera at the bench workload; this streaming kernel
does the same reduction in ~0.3 ms): given per-entry gradient rows in
source-sorted order, an inclusive scan that RESETS at segment
boundaries makes each segment's LAST lane carry the segment sum, which
a single sorted gather then extracts per gaussian.

No reference analog — the CUDA rasterizer accumulates with atomicAdd
(diff_gauss_pose backward); scatter-free accumulation is the TPU-native
design (PERFORMANCE.md design rule 2).

Layout: values (R, N) float32 with entries on the LANE axis (R <= 16
sublanes of fields), segment ids (1, N) int32 non-decreasing along
lanes.  The scan runs in sequential grid steps of `block` lanes with a
(R, 1) carry held in scratch across steps; within a block the segmented
scan is log2(block) roll-shift steps (Mosaic has no native scan).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _segscan_kernel(vals_ref, seg_ref, out_ref, carry_val, carry_seg,
                    *, block: int):
    c = pl.program_id(0)
    v = vals_ref[...]                      # (R, block)
    s = seg_ref[...]                       # (1, block)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)

    # Segment-start flags: lane 0 compares against the carried last
    # segment id of the previous block (or nothing on the first block).
    prev = pltpu.roll(s, 1, axis=1)

    @pl.when(c == 0)
    def _():
        carry_seg[0, 0] = jnp.int32(-1)
        carry_val[...] = jnp.zeros_like(carry_val)

    prev = jnp.where(lane == 0, carry_seg[0, 0], prev)
    # Flags as int32 (Mosaic can't rotate i1 vectors).
    newseg = (s != prev).astype(jnp.int32)  # (1, block)

    # Segmented inclusive scan via log2(block) shifts: x_i += x_{i-k}
    # unless a segment start lies within (i-k, i]; B_k tracks that.
    x = v
    b = newseg
    k = 1
    while k < block:
        xs = pltpu.roll(x, k, axis=1)
        add = (lane >= k) & (b == 0)
        x = x + jnp.where(add, xs, 0.0)
        bs = pltpu.roll(b, k, axis=1)
        b = b | jnp.where(lane >= k, bs, 0)
        k *= 2

    # Lanes before the block's first segment start continue the previous
    # block's running segment: add the carried value.  b is now the
    # inclusive prefix-OR of newseg over the whole block.
    x = x + jnp.where(b == 0, carry_val[...], 0.0)

    out_ref[...] = x
    carry_val[...] = x[:, block - 1:block]
    carry_seg[0, 0] = s[0, block - 1]


def segmented_scan_lanes(
    vals: jax.Array,   # (R, N) float32
    seg: jax.Array,    # (N,) int32, non-decreasing
    block: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """Inclusive sum-scan along lanes, resetting where `seg` changes."""
    r, n = vals.shape
    assert n % block == 0, (n, block)
    assert block & (block - 1) == 0, block
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_segscan_kernel, block=block)
    return pl.pallas_call(
        kernel,
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((r, block), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, block), lambda c: (0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, n), vals.dtype),
        scratch_shapes=[
            pltpu.VMEM((r, 1), vals.dtype),
            pltpu.SMEM((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(vals, seg.reshape(1, n))


def _cumsum_kernel(vals_ref, out_ref, carry, *, block: int):
    c = pl.program_id(0)
    v = vals_ref[...]                      # (1, block)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)

    @pl.when(c == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    x = v
    k = 1
    while k < block:
        xs = pltpu.roll(x, k, axis=1)
        x = x + jnp.where(lane >= k, xs, jnp.zeros((), x.dtype))
        k *= 2
    x = x + carry[...]
    out_ref[...] = x
    carry[...] = x[:, block - 1:block]


def cumsum_1d(
    vals: jax.Array,   # (N,) int32 or float32
    block: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """Inclusive cumulative sum of a 1-D array via a streaming Pallas
    scan (XLA lowers jnp.cumsum to reduce-window: ~1.3 ms at 131k int32
    on v5e; this runs in ~0.1 ms)."""
    (n,) = vals.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_pad = -(-n // block) * block
    padded = vals
    if n_pad != n:
        padded = jnp.concatenate(
            [vals, jnp.zeros((n_pad - n,), vals.dtype)]
        )
    kernel = functools.partial(_cumsum_kernel, block=block)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // block,),
        in_specs=[
            pl.BlockSpec((1, block), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block), lambda c: (0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), vals.dtype),
        scratch_shapes=[pltpu.VMEM((1, 1), vals.dtype)],
        interpret=interpret,
    )(padded.reshape(1, n_pad))
    return out[0, :n]
