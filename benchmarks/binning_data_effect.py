"""Why is the same binning 50x slower on the real bench input?

Times bin_gaussians on (a) the bench workload's projected gaussians and
(b) synthetic uniform xy/depth/radius of identical shapes, then sweeps
which field of (a) is replaced by synthetic data to isolate the culprit.
"""

from __future__ import annotations

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
    from spfsplatv2_tpu.ops.covariance import build_covariance
    from spfsplatv2_tpu.ops.raster_common import project_gaussians
    from spfsplatv2_tpu.ops import raster_tiled

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
    k = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])
    c2w = jnp.eye(4)

    proj = jax.jit(
        lambda m, c, hh, o: project_gaussians(
            m, c, hh, o, c2w, k, (h, w), sh_degree=None, use_sh=True
        )
    )(means, covs, harmonics, opacities)
    proj = jax.tree.map(lambda x: jax.device_get(x), proj)

    @jax.jit
    def bin_fn(proj):
        b = raster_tiled.bin_gaussians(proj, (h, w), 16)
        return b.ids_sorted, b.tile_starts

    from spfsplatv2_tpu.ops.raster_common import ProjectedGaussians

    def put(**over):
        d = dict(
            xy=jnp.asarray(proj.xy), conic=jnp.asarray(proj.conic),
            depth=jnp.asarray(proj.depth), color=jnp.asarray(proj.color),
            opacity=jnp.asarray(proj.opacity),
            radius=jnp.asarray(proj.radius),
        )
        d.update(over)
        return ProjectedGaussians(**d)

    rng = np.random.default_rng(0)
    synth_xy = jnp.asarray(
        rng.uniform(-20, w + 20, size=(g, 2)), jnp.float32
    )
    synth_depth = jnp.asarray(rng.uniform(0.5, 10, size=(g,)), jnp.float32)
    synth_radius = jnp.asarray(rng.integers(2, 10, size=(g,)), jnp.int32)

    t = timeit(lambda: bin_fn(put()))
    print(f"real proj: {t:.2f} ms", flush=True)
    t = timeit(lambda: bin_fn(put(xy=synth_xy, depth=synth_depth,
                                  radius=synth_radius)))
    print(f"all synth: {t:.2f} ms", flush=True)
    t = timeit(lambda: bin_fn(put(xy=synth_xy)))
    print(f"synth xy only: {t:.2f} ms", flush=True)
    t = timeit(lambda: bin_fn(put(depth=synth_depth)))
    print(f"synth depth only: {t:.2f} ms", flush=True)
    t = timeit(lambda: bin_fn(put(radius=synth_radius)))
    print(f"synth radius only: {t:.2f} ms", flush=True)

    # distribution stats
    pr = np.asarray(proj.radius)
    print("radius: min", pr.min(), "max", pr.max(), "mean", pr.mean(),
          flush=True)
    px = np.asarray(proj.xy)
    print("xy x: min", px[:, 0].min(), "max", px[:, 0].max(), flush=True)
    pd = np.asarray(proj.depth)
    print("depth: min", pd.min(), "max", pd.max(), flush=True)


if __name__ == "__main__":
    main()
