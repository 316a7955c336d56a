"""Stage-cost probe for the prefix rasterizer at the bench workload.

Times, per camera, at the bench.py scene (131k pixel-aligned gaussians,
256^2): binning alone, forward, forward+backward — single-tier vs
two-tier duplicate expansion.  Run SERIALLY on the real chip (host load
inflates device time; see PERFORMANCE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/prefix_stages.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from spfsplatv2_tpu.ops.covariance import build_covariance
from spfsplatv2_tpu.ops.raster_common import project_gaussians
from spfsplatv2_tpu.ops.raster_tiled import bin_gaussians_prefix
from spfsplatv2_tpu.ops.rasterizer import RasterizerConfig, render

H = W = 256
VIEWS = 2
G = VIEWS * H * W
CHUNK = 256
DUP = 16
BUDGET = 2 * G


def make_scene():
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 8)
    means = jnp.concatenate(
        [
            jax.random.uniform(keys[0], (G, 2), minval=-1.5, maxval=1.5),
            jax.random.uniform(keys[1], (G, 1), minval=1.0, maxval=6.0),
        ],
        axis=-1,
    )
    scales = 0.002 + 0.01 * jax.random.uniform(keys[2], (G, 3))
    covs = build_covariance(scales, jax.random.normal(keys[3], (G, 4)))
    harmonics = 0.3 * jax.random.normal(keys[4], (G, 3, 25))
    opacities = jax.random.uniform(keys[5], (G,), minval=0.3, maxval=0.9)
    return means, covs, harmonics, opacities


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    means, covs, harmonics, opacities = make_scene()
    k = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])
    c2w = jnp.eye(4)
    target = jax.random.uniform(jax.random.PRNGKey(7), (H, W, 3))

    proj = jax.jit(
        lambda m, c, hh, o: project_gaussians(
            m, c, hh, o, c2w, k, (H, W), sh_degree=None, use_sh=True
        )
    )(means, covs, harmonics, opacities)
    jax.block_until_ready(proj)

    for base, pool, dk in (
        (None, 0.125, "rank"), (4, 0.125, "rank"), (2, 0.25, "rank"),
        (4, 0.125, "quantized"), (2, 0.25, "quantized"),
    ):
        binf = jax.jit(
            lambda p, base=base, pool=pool, dk=dk: bin_gaussians_prefix(
                p, (H, W), DUP, CHUNK, BUDGET,
                base_tiles_per_gaussian=base, big_pool_factor=pool,
                depth_key=dk,
            )
        )
        bins = binf(proj)
        jax.block_until_ready(bins)
        ms = timeit(binf, proj)
        print(f"bin[base={base} pool={pool} {dk}]: {ms:.2f} ms  "
              f"n_live={int(bins.n_live)} overflow={int(bins.n_overflow)} "
              f"e_pad={bins.e_pad}", flush=True)

    # End-to-end single camera fwd / fwd+bwd through the public API.
    for base, dk in ((None, "rank"), (4, "rank"), (4, "quantized"),
                     (2, "quantized")):
        cfg = RasterizerConfig(
            backend="pallas", scale_invariant=False, chunk=CHUNK,
            max_tiles_per_gaussian=DUP, entry_budget=BUDGET,
            base_tiles_per_gaussian=base,
            big_pool_factor=0.25 if base == 2 else 0.125,
            depth_key=dk,
        )

        def fwd(m, c, hh, o):
            out = render(
                c2w[None], k[None], jnp.ones((1,)), jnp.full((1,), 100.0),
                (H, W), jnp.zeros((1, 3)), m, c, hh, o, cfg=cfg,
            )
            return out.color

        def loss(m, c, hh, o, e):
            out = render(
                e[None], k[None], jnp.ones((1,)), jnp.full((1,), 100.0),
                (H, W), jnp.zeros((1, 3)), m, c, hh, o, cfg=cfg,
            )
            return jnp.mean((out.color[0] - target) ** 2)

        f = jax.jit(fwd)
        fb = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
        ms_f = timeit(f, means, covs, harmonics, opacities)
        ms_fb = timeit(fb, means, covs, harmonics, opacities, c2w)
        print(f"e2e[base={base} {dk}]: fwd {ms_f:.2f} ms   fwd+bwd {ms_fb:.2f} ms "
              f"({H * W / ms_fb / 1e3:.2f} Mpix/s)", flush=True)


if __name__ == "__main__":
    main()
