"""Dissect the prefix-layout backward: kernel vs transpose vs scatter-set.

The prefix backend measured fwd 8.0 ms / fwd+bwd 40.1 ms on v5e — the
backward glue is ~4x the compact path's.  Time each piece in isolation.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1400 \
  python -u benchmarks/prefix_bwd_dissect.py
"""

from __future__ import annotations

import functools
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
    from spfsplatv2_tpu.ops import raster_pallas, raster_tiled
    from spfsplatv2_tpu.ops.covariance import build_covariance
    from spfsplatv2_tpu.ops.raster_common import project_gaussians

    h = w = 256
    g = 2 * h * w
    dup = 16
    chunk = 256
    # Derive grid/field constants from the library so this benchmark can
    # never silently measure a mismatched configuration (ADVICE r2).
    from spfsplatv2_tpu.ops import raster_pallas as _rp, raster_tiled as _rt
    num_tiles_xy = (-(-h // _rt.TILE), -(-w // _rt.TILE))
    n_fields = _rp.NUM_FIELDS
    budget = 2 * g
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

    proj_fn = jax.jit(functools.partial(
        project_gaussians, image_shape=(h, w), sh_degree=None, use_sh=True))
    proj = proj_fn(means, covs, harmonics, opacities, c2w, k)

    @jax.jit
    def bin_fn(proj):
        b = raster_tiled.bin_gaussians_prefix(proj, (h, w), dup, chunk, budget)
        return b.flat, b.src, b.counts, b.starts, b.n_live
    t_bin = timeit(lambda: bin_fn(proj))
    print(f"prefix binning: {t_bin:.2f} ms", flush=True)
    flat_p, src, counts, starts, n_live = map(jax.device_put,
                                              map(jax.device_get,
                                                  bin_fn(proj)))
    e_pad = flat_p.shape[0]
    print(f"e_pad={e_pad} n_live={int(n_live)}", flush=True)

    @jax.jit
    def gather_fn(proj, src):
        depth_safe = jnp.where(jnp.isfinite(proj.depth), proj.depth, 0.0)
        xy_safe = jnp.where(jnp.isfinite(proj.xy), proj.xy, 0.0)
        packed = jnp.concatenate(
            [xy_safe, proj.conic, proj.color, proj.opacity[:, None],
             depth_safe[:, None]], axis=-1)
        rows = packed[src]
        return jnp.concatenate(
            [rows.T, jnp.zeros((raster_pallas.FEAT - n_fields, e_pad))], axis=0)
    t_g = timeit(lambda: gather_fn(proj, src))
    print(f"gather+transpose: {t_g:.2f} ms", flush=True)
    attrs_t = gather_fn(proj, src)

    # fwd kernel (unaligned)
    fwd = jax.jit(lambda a, c, s: raster_pallas._fwd_call(
        a, c, s, num_tiles_xy, chunk, e_pad, False, 1, unaligned=True))
    t_f = timeit(fwd, attrs_t, counts, starts)
    print(f"fwd kernel (unaligned): {t_f:.2f} ms", flush=True)
    fwd_out = fwd(attrs_t, counts, starts)
    gbuf = jnp.ones_like(fwd_out)

    # bwd kernel (unaligned, incl. RMW merges)
    bwd = jax.jit(lambda a, c, s, fo, gb: raster_pallas._bwd_call(
        a, c, s, fo, gb, num_tiles_xy, chunk, e_pad, False, 1,
        padded_capacity=False, unaligned=True))
    t_b = timeit(bwd, attrs_t, counts, starts, fwd_out, gbuf)
    print(f"bwd kernel (unaligned+rmw): {t_b:.2f} ms", flush=True)
    dattrs_t = bwd(attrs_t, counts, starts, fwd_out, gbuf)

    # transpose back
    tr = jax.jit(lambda d: d[:raster_pallas.NUM_FIELDS, :].T + 0.0)
    t_tr = timeit(tr, dattrs_t)
    print(f"dattrs transpose: {t_tr:.2f} ms", flush=True)
    drows = tr(dattrs_t)

    # mask + scatter-set + reshape-sum
    @jax.jit
    def accum(drows, flat_p, n_live):
        live = (jnp.arange(e_pad, dtype=jnp.int32) < n_live)[:, None]
        dr = jnp.where(live, drows, 0.0)
        dflat = jnp.zeros((g * dup, raster_pallas.NUM_FIELDS), dr.dtype)
        dflat = dflat.at[flat_p].set(dr, unique_indices=True, mode="drop")
        return dflat.reshape(g, dup, raster_pallas.NUM_FIELDS).sum(axis=1)
    t_acc = timeit(accum, drows, flat_p, n_live)
    print(f"mask+scatter-set+sum: {t_acc:.2f} ms", flush=True)

    # scatter-set alone
    @jax.jit
    def scat(drows, flat_p):
        dflat = jnp.zeros((g * dup, raster_pallas.NUM_FIELDS), drows.dtype)
        return dflat.at[flat_p].set(drows, unique_indices=True, mode="drop")
    t_sc = timeit(scat, drows, flat_p)
    print(f"scatter-set alone: {t_sc:.2f} ms", flush=True)

    # alternative accumulation: sort drows by src via gather? -- baseline:
    # the compact path's duplicate-index scatter-ADD for comparison
    @jax.jit
    def scat_add(drows, src):
        dpacked = jnp.zeros((g, raster_pallas.NUM_FIELDS), drows.dtype)
        return dpacked.at[src].add(drows, mode="drop")
    t_sa = timeit(scat_add, drows, src)
    print(f"scatter-ADD by src (compact-style): {t_sa:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
