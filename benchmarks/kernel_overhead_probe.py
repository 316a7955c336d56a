"""Decompose the compositing kernel cost: per-grid-step overhead vs math.

The bench tile stats (mean 828 entries, T_EPS early exit after ~1-2
chunks) imply each grid step does little math, so the measured ~3 ms
forward kernel may be mostly fixed per-step cost.  Variants:
  zero   — counts all 0: pure grid/step overhead (256 steps)
  one    — counts = chunk: exactly one chunk of math + 1 DMA per tile
  real   — real bench counts
  real512— real counts, chunk=512 (fewer loop iterations per tile)
  real128— real counts, chunk=128

Run: timeout 2400 env PYTHONPATH=/root/repo:/root/.axon_site \
  python -u benchmarks/kernel_overhead_probe.py > /tmp/kovh.log 2>&1
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from spfsplatv2_tpu.ops import raster_pallas, raster_tiled


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

    max_per_tile = 2048
    entry_budget = 2 * g

    for chunk in (128, 256, 512):
        @jax.jit
        def bin_fn(proj, chunk=chunk):
            b = raster_tiled.bin_gaussians_compact(
                proj, (h, w), 16, chunk, max_per_tile, entry_budget)
            return b.src, b.slot_live, b.counts, b.starts
        src, slot_live, counts, starts = jax.block_until_ready(bin_fn(proj))
        e_aligned = src.shape[0]
        tiles_xy = (h // 16, w // 16)
        bins = raster_tiled.CompactBins(
            src, slot_live, counts, starts, tiles_xy, e_aligned)

        depth_safe = jnp.where(jnp.isfinite(proj.depth), proj.depth, 0.0)
        packed = jnp.concatenate(
            [proj.xy, proj.conic, proj.color, proj.opacity[:, None],
             depth_safe[:, None]], axis=-1)
        attrs_t = jnp.concatenate([
            jnp.where(bins.slot_live[:, None], packed[bins.src], 0.0).T,
            jnp.zeros((raster_pallas.FEAT - 10, e_aligned))], axis=0)
        attrs_t = jax.block_until_ready(jax.jit(lambda x: x)(attrs_t))

        core = jax.jit(functools.partial(
            raster_pallas._composite_core,
            num_tiles_xy=bins.num_tiles_xy, chunk=chunk,
            max_per_tile=max_per_tile, interpret=False, n_cam=1,
            padded_capacity=False))

        zero_counts = jnp.zeros_like(bins.counts)
        one_counts = jnp.minimum(bins.counts, 1)
        t_zero = timeit(lambda: core(attrs_t, zero_counts, bins.starts))
        t_one = timeit(lambda: core(attrs_t, one_counts, bins.starts))
        t_real = timeit(lambda: core(attrs_t, bins.counts, bins.starts))
        n_ch = int(jnp.sum(-(-bins.counts // chunk)))
        print(f"chunk={chunk:4d}: zero {t_zero:6.2f}  one-entry {t_one:6.2f}"
              f"  real {t_real:6.2f} ms   ({n_ch} real chunks)", flush=True)


if __name__ == "__main__":
    main()
