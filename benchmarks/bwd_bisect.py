"""Attribute the rasterizer BACKWARD glue cost op by op.

e2e fwd+bwd minus fwd minus the bwd kernel leaves ~4-8 ms of XLA glue:
the gather-VJP scatter-add, transposes, where/concat VJPs, and the
projection VJP.  Times composed jits (trustworthy regime) that replay the
backward chain piece by piece on bench-shaped data.

Run: timeout 2400 env PYTHONPATH=/root/repo:/root/.axon_site \
  python -u benchmarks/bwd_bisect.py > /tmp/bwdbis.log 2>&1
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp

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
    chunk = 256
    max_per_tile = 2048
    entry_budget = 2 * g

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

    @jax.jit
    def bin_fn(proj):
        b = raster_tiled.bin_gaussians_compact(
            proj, (h, w), 16, chunk, max_per_tile, entry_budget)
        return b.src, b.slot_live, b.counts, b.starts
    src, live, cnt, starts = jax.block_until_ready(bin_fn(proj))
    e_aligned = src.shape[0]
    tiles_xy = (h // 16, w // 16)

    depth_safe = jnp.where(jnp.isfinite(proj.depth), proj.depth, 0.0)
    packed = jnp.concatenate(
        [proj.xy, proj.conic, proj.color, proj.opacity[:, None],
         depth_safe[:, None]], axis=-1)
    packed = jax.block_until_ready(jax.jit(lambda x: x)(packed))
    dattrs = jax.block_until_ready(
        jax.random.normal(keys[6], (raster_pallas.FEAT, e_aligned)))

    # -- piece 1: dattrs (16, E) -> rows (E, 10) transpose+slice
    t1 = timeit(jax.jit(lambda d: d[:10].T + 0.0), dattrs)
    print(f"dattrs transpose+slice (16,E)->(E,10): {t1:.2f} ms", flush=True)

    # -- piece 2: where-VJP mask (select at (E, 10))
    t2 = timeit(jax.jit(
        lambda d, lv: jnp.where(lv[:, None], d[:10].T, 0.0)), dattrs, live)
    print(f"+ where mask: {t2:.2f} ms", flush=True)

    # -- piece 3: scatter-add into (g, 10)
    t3 = timeit(jax.jit(
        lambda d, lv, s: jnp.zeros((g, 10), jnp.float32).at[s].add(
            jnp.where(lv[:, None], d[:10].T, 0.0))), dattrs, live, src)
    print(f"+ scatter-add 327k -> (g,10): {t3:.2f} ms", flush=True)

    # -- piece 4: full gather VJP through jax (vjp of the fwd gather chain)
    def fwd_chain(packed):
        rows = jnp.where(live[:, None], packed[src], 0.0)
        return jnp.concatenate(
            [rows.T, jnp.zeros((raster_pallas.FEAT - 10, e_aligned))], axis=0)

    _, vjp = jax.vjp(fwd_chain, packed)
    vjp_j = jax.jit(lambda d: vjp(d)[0])
    t4 = timeit(vjp_j, dattrs)
    print(f"full gather-chain VJP: {t4:.2f} ms", flush=True)

    # -- piece 5: projection VJP (proj grads -> means/covs/pose)
    def proj_chain(m, c, hh, o, e):
        p = project_gaussians(m, c, hh, o, e, kmat, (h, w),
                              sh_degree=None, use_sh=True)
        return jnp.concatenate(
            [p.xy, p.conic, p.color, p.opacity[:, None],
             jnp.where(jnp.isfinite(p.depth), p.depth, 0.0)[:, None]],
            axis=-1)

    _, pvjp = jax.vjp(proj_chain, means, covs, harmonics, opacities, c2w)
    dpacked = jax.random.normal(keys[7], (g, 10))
    pvjp_j = jax.jit(lambda d: pvjp(d))
    t5 = timeit(pvjp_j, dpacked)
    print(f"projection VJP: {t5:.2f} ms", flush=True)

    # -- piece 6: bwd kernel alone
    packed16 = jnp.concatenate(
        [packed, jnp.zeros((g, raster_pallas.FEAT - 10))], axis=-1)
    attrs_t = jnp.where(live[None, :], packed16.T[:, src], 0.0)
    attrs_t = jax.block_until_ready(jax.jit(lambda x: x)(attrs_t))

    @jax.jit
    def core_grad(attrs_t, cnt, starts):
        def f(a):
            out = raster_pallas._composite_core(
                a, cnt, starts, tiles_xy, chunk, max_per_tile,
                False, 1, False)
            return jnp.sum(out[..., :5])
        return jax.grad(f)(attrs_t)
    t6 = timeit(core_grad, attrs_t, cnt, starts)
    print(f"fwd+bwd kernels (grad of core): {t6:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
