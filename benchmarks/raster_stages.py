"""Per-stage timing of the rasterizer pipeline on the real chip.

Breaks the fwd+bwd cost of one camera render (bench.py workload: 256^2,
131k pixel-aligned gaussians) into projection / binning / align+gather /
pallas fwd / end-to-end fwd / end-to-end fwd+bwd so perf work targets the
measured hot spot instead of a guess.

Run: timeout 1400 python -u benchmarks/raster_stages.py > /tmp/stages.log 2>&1
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
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    from spfsplatv2_tpu.ops.covariance import build_covariance
    from spfsplatv2_tpu.ops.raster_common import project_gaussians
    from spfsplatv2_tpu.ops import raster_tiled
    from spfsplatv2_tpu.ops import raster_pallas
    from spfsplatv2_tpu.ops.rasterizer import RasterizerConfig, render

    h = w = 256
    views = 2
    g = views * h * w
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
    image_shape = (h, w)
    max_tiles = 16
    max_per_tile = 2048
    chunk = 256

    # ---- stage 1: projection + SH
    proj_fn = jax.jit(functools.partial(
        project_gaussians, image_shape=image_shape, sh_degree=None,
        use_sh=True))
    t_proj = timeit(lambda: proj_fn(means, covs, harmonics, opacities, c2w, k))
    print(f"projection+SH: {t_proj:.2f} ms", flush=True)

    proj = proj_fn(means, covs, harmonics, opacities, c2w, k)
    import numpy as np
    np.savez("/tmp/real_proj.npz", xy=np.asarray(proj.xy),
             depth=np.asarray(proj.depth), radius=np.asarray(proj.radius))

    # live entry stats (single jit so the remote tunnel compiles ONE program,
    # not one per eager op)
    @jax.jit
    def stats_fn(proj):
        b = raster_tiled.bin_gaussians(proj, image_shape, max_tiles)
        counts = b.tile_starts[1:-1] - b.tile_starts[:-2]
        return (b.tile_starts[-2], jnp.mean(counts), jnp.max(counts),
                jnp.sum(proj.radius > 0))
    n_entries, cmean, cmax, live = map(
        lambda x: float(x), stats_fn(proj))
    print(f"live entries: {n_entries:.0f}  (cap {g*max_tiles})", flush=True)
    print(f"per-tile count: mean {cmean:.0f} max {cmax:.0f}", flush=True)
    print(f"live gaussians (radius>0): {live:.0f}", flush=True)

    entry_budget = 2 * g  # compact-layout budget (live ~1.61g at this scene)

    # ---- stage 2: compact binning (expand + scan + scatter + sort)
    @jax.jit
    def bin_fn(proj):
        b = raster_tiled.bin_gaussians_compact(
            proj, image_shape, max_tiles, chunk, max_per_tile, entry_budget)
        return b.src, b.slot_live, b.counts, b.starts
    t_bin = timeit(lambda: bin_fn(proj))
    print(f"binning (compact+sort): {t_bin:.2f} ms", flush=True)
    src_v, live_v, cnt_v, starts_v = bin_fn(proj)
    tiles_y, tiles_x = -(-h // raster_tiled.TILE), -(-w // raster_tiled.TILE)
    e_aligned = src_v.shape[0]
    bins = raster_tiled.CompactBins(
        src_v, live_v, cnt_v, starts_v, (tiles_y, tiles_x), e_aligned)

    # ---- stage 3: attribute gather into attrs_t
    @jax.jit
    def gather_fn(proj, src, live):
        depth_safe = jnp.where(jnp.isfinite(proj.depth), proj.depth, 0.0)
        packed = jnp.concatenate(
            [proj.xy, proj.conic, proj.color, proj.opacity[:, None],
             depth_safe[:, None]], axis=-1)
        rows = jnp.where(live[:, None], packed[src], 0.0)
        return jnp.concatenate(
            [rows.T, jnp.zeros((raster_pallas.FEAT - 10, e_aligned))], axis=0)
    t_ag = timeit(lambda: gather_fn(proj, bins.src, bins.slot_live))
    print(f"attr gather (10 x {e_aligned}): {t_ag:.2f} ms", flush=True)

    attrs_t = gather_fn(proj, bins.src, bins.slot_live)

    # ---- stage 4: pallas fwd kernel alone
    core = jax.jit(functools.partial(
        raster_pallas._composite_core,
        num_tiles_xy=bins.num_tiles_xy, chunk=chunk,
        max_per_tile=max_per_tile, interpret=False, n_cam=1,
        padded_capacity=False))
    t_core = timeit(lambda: core(attrs_t, cnt_v, starts_v))
    print(f"pallas fwd kernel: {t_core:.2f} ms", flush=True)

    # ---- stage 5: pallas fwd+bwd kernel alone (incl. scatter-free parts)
    @jax.jit
    def core_grad(attrs_t, cnt, starts):
        def f(a):
            out = raster_pallas._composite_core(
                a, cnt, starts, bins.num_tiles_xy, chunk, max_per_tile,
                False, 1, False)
            return jnp.sum(out[..., :5])
        return jax.grad(f)(attrs_t)
    t_coreg = timeit(lambda: core_grad(attrs_t, cnt_v, starts_v))
    print(f"pallas fwd+bwd kernel: {t_coreg:.2f} ms", flush=True)

    # ---- end-to-end single camera
    cfg = RasterizerConfig(backend="pallas", scale_invariant=False,
                           max_per_tile=max_per_tile, chunk=chunk,
                           max_tiles_per_gaussian=max_tiles,
                           entry_budget=entry_budget)
    near = jnp.ones((1,)); far = jnp.full((1,), 100.0)
    bg = jnp.zeros((1, 3))
    e1 = c2w[None]; k1 = k[None]

    fwd = jax.jit(lambda m, c, h_, o: render(
        e1, k1, near, far, image_shape, bg, m, c, h_, o, cfg=cfg).color)
    t_fwd = timeit(lambda: fwd(means, covs, harmonics, opacities))
    print(f"end-to-end fwd (1 cam): {t_fwd:.2f} ms", flush=True)

    tgt = jax.random.uniform(keys[6], (1, h, w, 3))

    @jax.jit
    def e2e_grad(m, c, h_, o, e):
        def f(m, c, h_, o, e):
            out = render(e, k1, near, far, image_shape, bg, m, c, h_, o,
                         cfg=cfg)
            return jnp.mean((out.color - tgt) ** 2)
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(m, c, h_, o, e)
    t_e2e = timeit(lambda: e2e_grad(means, covs, harmonics, opacities, e1))
    print(f"end-to-end fwd+bwd (1 cam): {t_e2e:.2f} ms", flush=True)
    print(f"implied 4-cam Mpix/s: {4 * h * w / (4 * t_e2e / 1e3) / 1e6:.2f}",
          flush=True)


if __name__ == "__main__":
    main()
