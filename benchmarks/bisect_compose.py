"""Bisect the composed rasterizer program: time cumulative prefixes as ONE
jit each. Standalone stages sum to ~4 ms but the full fwd measures 20 ms —
this locates where composition inflates cost.
"""

import time

import jax
import jax.numpy as jnp


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
    from spfsplatv2_tpu.ops import raster_pallas, raster_tiled

    h = w = 256
    g = 2 * h * w
    max_tiles = 16
    max_per_tile = 2048
    chunk = 256
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
    k = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])
    c2w = jnp.eye(4)
    bg = jnp.zeros((3,))

    def proj_stage(m, c, hh, o):
        return project_gaussians(m, c, hh, o, c2w, k, (h, w),
                                 sh_degree=None, use_sh=True)

    def bin_stage(m, c, hh, o):
        proj = proj_stage(m, c, hh, o)
        b = raster_tiled.bin_gaussians(proj, (h, w), max_tiles)
        return b.ids_sorted, b.tile_starts

    def align_stage(m, c, hh, o):
        proj = proj_stage(m, c, hh, o)
        bins = raster_tiled.bin_gaussians(proj, (h, w), max_tiles)
        ids, counts = raster_pallas.align_bins(
            bins, chunk, max_per_tile, g)
        return ids, seg_starts, counts

    def gather_stage(m, c, hh, o):
        proj = proj_stage(m, c, hh, o)
        bins = raster_tiled.bin_gaussians(proj, (h, w), max_tiles)
        ids, counts = raster_pallas.align_bins(
            bins, chunk, max_per_tile, g)
        depth_safe = jnp.where(jnp.isfinite(proj.depth), proj.depth, 0.0)
        packed = jnp.concatenate(
            [proj.xy, proj.conic, proj.color, proj.opacity[:, None],
             depth_safe[:, None],
             jnp.zeros((g, raster_pallas.FEAT - 10), proj.xy.dtype)],
            axis=-1)
        dummy = jnp.zeros((1, raster_pallas.FEAT), packed.dtype)
        packed = jnp.concatenate([packed, dummy], axis=0)
        return packed[ids].T, seg_starts, counts

    def full_stage(m, c, hh, o):
        proj = proj_stage(m, c, hh, o)
        bins = raster_tiled.bin_gaussians(proj, (h, w), max_tiles)
        color, depth, alpha = raster_pallas.composite_pallas(
            proj, bins, (h, w), bg, chunk=chunk, max_per_tile=max_per_tile)
        return color

    tgt = jax.random.uniform(keys[6], (h, w, 3))

    def loss_stage(m, c, hh, o):
        return jnp.mean((full_stage(m, c, hh, o) - tgt) ** 2)

    def grad_stage(m, c, hh, o):
        return jax.grad(loss_stage, argnums=(0, 1, 2, 3))(m, c, hh, o)

    stages = [
        ("proj", proj_stage),
        ("proj+bin", bin_stage),
        ("proj+bin+align", align_stage),
        ("proj+bin+align+gather", gather_stage),
        ("full fwd", full_stage),
        ("full fwd+bwd", grad_stage),
    ]
    for name, fn in stages:
        jf = jax.jit(fn)
        t = timeit(lambda: jf(means, covs, harmonics, opacities))
        print(f"{name}: {t:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
