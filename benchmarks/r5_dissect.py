"""Round-5 stage dissection of the CURRENT prefix rasterizer pipeline.

Times nested prefixes of the per-camera pipeline under the trusted
device-side regime (one jitted lax.scan over 20 perturbed-input
iterations, checksum fetched), so stage costs are DIFFERENCES between
adjacent programs — the only additive accounting the axon tunnel allows
(PERFORMANCE.md, last section).

Programs (1 camera unless noted):
  P0 projection only
  P1 P0 + prefix binning (incl. src_order sort)
  P2 P1 + attribute gather packed[src] + transpose to attrs_t
  P3 P2 + forward kernel            == full forward, 1 cam
  P4 full fwd                      (4 cameras, = bench stage_fwd / 4)
  P5 full fwd+bwd                  (4 cameras, headline / 4)
  B0 bwd kernel alone (bench-shaped synthetic inputs)
  B1 drows[src_order] gather alone (262k x 10)
  B2 sorted segment-sum alone (262k -> 131k, 10 cols)

Run: timeout 2400 env PYTHONPATH=/root/repo:/root/.axon_site \
      python -u benchmarks/r5_dissect.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".xla_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp  # noqa: E402

H = W = 256
VIEWS = 2
G = VIEWS * H * W
CHUNK = 256
ITERS = 20


def make_scene():
    from spfsplatv2_tpu.ops.covariance import build_covariance

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
    k = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])
    c2w = jnp.eye(4)
    return means, covs, harmonics, opacities, c2w, k


def scanned(body, *args):
    @jax.jit
    def run(seed, *a):
        def step(acc, key):
            m = a[0] + 1e-6 * jax.random.normal(key, a[0].shape, a[0].dtype)
            return acc + body(m, *a[1:]), None

        acc, _ = jax.lax.scan(
            step, jnp.zeros((), jnp.float32), jax.random.split(seed, ITERS)
        )
        return acc

    def timed(seed):
        t0 = time.perf_counter()
        jax.block_until_ready(run(jax.random.PRNGKey(seed), *args))
        return (time.perf_counter() - t0) / ITERS

    timed(0)  # compile + warm
    return min(timed(1), timed(2))


def main():
    from spfsplatv2_tpu.ops.raster_common import project_gaussians
    from spfsplatv2_tpu.ops.raster_pallas import (
        FEAT, NUM_FIELDS, _bwd_call, _fwd_call, composite_pallas_prefix,
    )
    from spfsplatv2_tpu.ops.raster_tiled import bin_gaussians_prefix
    from spfsplatv2_tpu.ops.rasterizer import RasterizerConfig, render

    means, covs, harmonics, opacities, c2w, k = make_scene()
    cfg = RasterizerConfig(
        backend="pallas", scale_invariant=False, chunk=CHUNK,
        max_tiles_per_gaussian=16, entry_budget=2 * G,
    )

    def proj_of(m):
        return project_gaussians(
            m, covs, harmonics, opacities, c2w, k, (H, W),
            sh_degree=None, use_sh=True,
        )

    def bins_of(proj):
        return bin_gaussians_prefix(
            proj, (H, W), cfg.max_tiles_per_gaussian, CHUNK, 2 * G,
            base_tiles_per_gaussian=cfg.base_tiles_per_gaussian,
            big_pool_factor=cfg.big_pool_factor, depth_key=cfg.depth_key,
        )

    out = {}

    def p0(m):
        proj = proj_of(m)
        return jnp.sum(proj.xy) + jnp.sum(proj.color) + jnp.sum(proj.conic)

    out["p0_projection_ms"] = scanned(p0, means) * 1e3
    print(json.dumps(out), flush=True)

    def p1(m):
        proj = proj_of(m)
        bins = bins_of(proj)
        # Checksums must be order-SENSITIVE: sum(src_order) is a constant
        # (permutation sum) and lets XLA fold the sort away entirely.
        w = jnp.arange(bins.src_order.shape[0], dtype=jnp.float32)
        return (
            jnp.sum(bins.counts * jnp.arange(bins.counts.shape[0]))
            .astype(jnp.float32)
            + jnp.sum(bins.src_order.astype(jnp.float32) * w)
            + jnp.sum(bins.src_sorted[::97]).astype(jnp.float32)
            + jnp.sum(proj.color)
        )

    out["p1_plus_binning_ms"] = scanned(p1, means) * 1e3
    print(json.dumps(out), flush=True)

    def p2(m):
        proj = proj_of(m)
        bins = bins_of(proj)
        packed = jnp.concatenate(
            [proj.xy, proj.conic, proj.color, proj.opacity[:, None],
             proj.depth[:, None]], axis=-1,
        )
        rows = packed[bins.src]
        attrs_t = jnp.concatenate(
            [rows.T, jnp.zeros((FEAT - NUM_FIELDS, rows.shape[0]),
                               packed.dtype)], axis=0,
        )
        w = jnp.arange(bins.src_order.shape[0], dtype=jnp.float32)
        return (
            jnp.sum(attrs_t * attrs_t[::-1])
            + jnp.sum(bins.src_order.astype(jnp.float32) * w)
        )

    out["p2_plus_gather_ms"] = scanned(p2, means) * 1e3
    print(json.dumps(out), flush=True)

    bg1 = jnp.zeros((3,))

    def p3(m):
        proj = proj_of(m)
        bins = bins_of(proj)
        color, depth, alpha = composite_pallas_prefix(
            proj, bins, (H, W), bg1, chunk=CHUNK,
        )
        return jnp.sum(color) + jnp.sum(depth) + jnp.sum(alpha)

    out["p3_full_fwd_1cam_ms"] = scanned(p3, means) * 1e3
    print(json.dumps(out), flush=True)

    def p5(m):
        def loss(m2):
            color, depth, alpha = composite_pallas_prefix(
                proj_of(m2), bins_of(proj_of(m2)), (H, W), bg1, chunk=CHUNK,
            )
            return jnp.mean(color ** 2) + jnp.mean(depth) * 1e-3

        g = jax.grad(loss)(m)
        return jnp.sum(jnp.abs(g))

    out["p5_fwd_bwd_1cam_ms"] = scanned(p5, means) * 1e3
    print(json.dumps(out), flush=True)

    # --- isolated backward sub-ops at bench shapes ----------------------
    e_pad = 2 * G + CHUNK
    key = jax.random.PRNGKey(7)
    drows = jax.random.normal(key, (e_pad, NUM_FIELDS))
    # sorted src stream: ~1.61 entries per gaussian like the bench scene
    src_sorted_np = jnp.sort(
        jax.random.randint(jax.random.PRNGKey(8), (e_pad,), 0, G)
    ).astype(jnp.int32)
    src_order = jax.random.permutation(
        jax.random.PRNGKey(9), jnp.arange(e_pad, dtype=jnp.int32)
    )

    def b1(d):
        return jnp.sum(d[src_order])

    out["b1_permute_gather_ms"] = scanned(b1, drows) * 1e3
    print(json.dumps(out), flush=True)

    def b2(d):
        s = jax.ops.segment_sum(
            d, src_sorted_np, num_segments=G + 1, indices_are_sorted=True
        )
        return jnp.sum(s)

    out["b2_sorted_segsum_ms"] = scanned(b2, drows) * 1e3
    print(json.dumps(out), flush=True)

    # --- kernels alone over a REAL binning (fixed) ----------------------
    proj = proj_of(means)
    bins = bins_of(proj)
    packed = jnp.concatenate(
        [proj.xy, proj.conic, proj.color, proj.opacity[:, None],
         proj.depth[:, None]], axis=-1,
    )
    rows = packed[bins.src]
    attrs_t = jnp.concatenate(
        [rows.T, jnp.zeros((FEAT - NUM_FIELDS, rows.shape[0]),
                           packed.dtype)], axis=0,
    )
    attrs_t = jax.block_until_ready(attrs_t)
    counts, starts = bins.counts, bins.starts
    ntxy = bins.num_tiles_xy

    # NOTE: `scanned` perturbs its FIRST arg per iteration — pass a tiny
    # dummy first so the (16, 262k) attrs buffer isn't re-randomized per
    # pass (generating 4M normals costs ~1 ms; inflated earlier k_* numbers).
    dummy = jnp.zeros((8,), jnp.float32)

    def k_fwd(d, a):
        o = _fwd_call(a + d[0], counts, starts, ntxy, CHUNK, a.shape[1],
                      False, 1, unaligned=True)
        return jnp.sum(o)

    out["k_fwd_kernel_ms"] = scanned(k_fwd, dummy, attrs_t) * 1e3
    print(json.dumps(out), flush=True)

    fwd_out = _fwd_call(attrs_t, counts, starts, ntxy, CHUNK,
                        attrs_t.shape[1], False, 1, unaligned=True)
    g = jax.random.normal(jax.random.PRNGKey(10), fwd_out.shape)

    def k_bwd(dm, a):
        d = _bwd_call(a + dm[0], counts, starts, fwd_out, g, ntxy, CHUNK,
                      a.shape[1], False, 1, unaligned=True)
        return jnp.sum(d)

    out["k_bwd_kernel_ms"] = scanned(k_bwd, dummy, attrs_t) * 1e3
    print(json.dumps(out), flush=True)

    # live entry stats
    out["n_live"] = int(bins.n_live)
    out["e_pad"] = int(bins.e_pad)
    out["n_overflow"] = int(bins.n_overflow)
    print("FINAL " + json.dumps({k: (round(v, 3) if isinstance(v, float)
                                     else v) for k, v in out.items()}),
          flush=True)


if __name__ == "__main__":
    main()
