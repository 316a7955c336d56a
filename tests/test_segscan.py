"""Unit tests for the Pallas segmented-scan accumulation primitives.

These back the rasterizer's scatter-free backward accumulation
(ops/segscan.py; wired in ops/raster_pallas._prefix_core_bwd — the
end-to-end gradient parity is covered by tests/test_raster_pallas.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _ref_segscan(vals, seg):
    ref = np.zeros_like(vals)
    acc = np.zeros(vals.shape[0], vals.dtype)
    prev = None
    for i in range(vals.shape[1]):
        if seg[i] != prev:
            acc = np.zeros(vals.shape[0], vals.dtype)
            prev = seg[i]
        acc = acc + vals[:, i]
        ref[:, i] = acc
    return ref


class TestSegmentedScan:
    @pytest.mark.parametrize("block", [64, 128, 256])
    def test_matches_reference(self, block):
        from spfsplatv2_tpu.ops.segscan import segmented_scan_lanes

        rng = np.random.default_rng(0)
        n, r = 4 * block, 16
        vals = rng.normal(size=(r, n)).astype(np.float32)
        seg = np.sort(rng.integers(0, n // 3, n)).astype(np.int32)
        out = np.asarray(segmented_scan_lanes(
            jnp.asarray(vals), jnp.asarray(seg), block=block, interpret=True
        ))
        np.testing.assert_allclose(out, _ref_segscan(vals, seg),
                                   rtol=1e-5, atol=1e-5)

    def test_segment_spanning_blocks(self):
        """A single segment across many blocks exercises the carry."""
        from spfsplatv2_tpu.ops.segscan import segmented_scan_lanes

        n, r, block = 512, 4, 64
        vals = np.ones((r, n), np.float32)
        seg = np.zeros((n,), np.int32)
        out = np.asarray(segmented_scan_lanes(
            jnp.asarray(vals), jnp.asarray(seg), block=block, interpret=True
        ))
        np.testing.assert_allclose(out[0], np.arange(1, n + 1))

    def test_boundary_at_block_edge(self):
        """Segment change exactly at a block boundary."""
        from spfsplatv2_tpu.ops.segscan import segmented_scan_lanes

        n, r, block = 256, 2, 64
        vals = np.ones((r, n), np.float32)
        seg = (np.arange(n) // block).astype(np.int32)  # new seg per block
        out = np.asarray(segmented_scan_lanes(
            jnp.asarray(vals), jnp.asarray(seg), block=block, interpret=True
        ))
        expected = np.tile(np.arange(1, block + 1), n // block)
        np.testing.assert_allclose(out[0], expected)

    def test_segment_sums_via_ends(self):
        """The accumulation recipe: segment sums read at cumsum(counts)-1."""
        from spfsplatv2_tpu.ops.segscan import (
            cumsum_1d,
            segmented_scan_lanes,
        )

        rng = np.random.default_rng(3)
        n_seg, block = 40, 64
        counts = rng.integers(0, 5, n_seg).astype(np.int32)
        n = -(-int(counts.sum()) // block) * block
        seg = np.repeat(np.arange(n_seg), counts)
        pad = n - len(seg)
        seg = np.concatenate([seg, np.full(pad, n_seg)]).astype(np.int32)
        vals = rng.normal(size=(8, n)).astype(np.float32)
        vals[:, len(seg) - pad:] = 0.0
        scanned = np.asarray(segmented_scan_lanes(
            jnp.asarray(vals), jnp.asarray(seg), block=block, interpret=True
        ))
        ends = np.asarray(cumsum_1d(jnp.asarray(counts), block=block,
                                    interpret=True))
        take = np.clip(ends - 1, 0, n - 1)
        got = scanned[:, take]
        got = np.where((counts > 0)[None, :], got, 0.0)
        want = np.stack(
            [vals[:, seg[:n] == s].sum(axis=1) for s in range(n_seg)], axis=1
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestCumsum1D:
    @pytest.mark.parametrize("n", [1, 63, 64, 1000])
    def test_matches_numpy(self, n):
        from spfsplatv2_tpu.ops.segscan import cumsum_1d

        rng = np.random.default_rng(n)
        x = rng.integers(-5, 9, n).astype(np.int32)
        np.testing.assert_array_equal(
            np.asarray(cumsum_1d(jnp.asarray(x), block=64, interpret=True)),
            np.cumsum(x),
        )
