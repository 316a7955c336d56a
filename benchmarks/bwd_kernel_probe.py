"""Inside the prefix backward: kernel vs scatter glue, device-side timing.

bwd_dissect.py showed every gradient subset costs ~40 ms/cam (fwd-only
6.6): the shared backward structure is ~33 ms/cam.  This probe times its
pieces with the trusted regime (one lax.scan dispatch, perturbed inputs,
checksum fetch), one camera:

  * fwd kernel alone          (_fwd_call on a fixed prefix layout)
  * bwd kernel alone          (_bwd_call, perturbed output cotangents)
  * scatter-set + dense sum   (the _prefix_core_bwd accumulation)
  * full _prefix_core VJP     (kernel + scatter + masks)
  * projection VJP            (EWA + SH backward, no compositing)

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python -u benchmarks/bwd_kernel_probe.py
"""

from __future__ import annotations

import json
import os
import time

import jax

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".xla_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp  # noqa: E402

ITERS = 20


def main():
    from spfsplatv2_tpu.ops import raster_pallas as rp
    from spfsplatv2_tpu.ops import raster_tiled as rt
    from spfsplatv2_tpu.ops.covariance import build_covariance
    from spfsplatv2_tpu.ops.raster_common import project_gaussians

    h = w = 256
    g = 2 * h * w
    chunk = 256
    budget = 2 * g
    num_tiles_xy = (-(-h // rt.TILE), -(-w // rt.TILE))
    n_tiles = num_tiles_xy[0] * num_tiles_xy[1]

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

    @jax.jit
    def build(means, covs, harmonics, opacities):
        proj = project_gaussians(
            means, covs, harmonics, opacities, c2w, k, (h, w),
            sh_degree=None, use_sh=True,
        )
        bins = rt.bin_gaussians_prefix(
            proj, (h, w), 16, chunk, budget, base_tiles_per_gaussian=4,
            big_pool_factor=0.125, depth_key="rank",
        )
        depth_safe = jnp.where(jnp.isfinite(proj.depth), proj.depth, 0.0)
        xy_safe = jnp.where(jnp.isfinite(proj.xy), proj.xy, 0.0)
        packed = jnp.concatenate(
            [xy_safe, proj.conic, proj.color, proj.opacity[:, None],
             depth_safe[:, None]], axis=-1,
        )
        rows = packed[bins.src]
        attrs_t = jnp.concatenate(
            [rows.T,
             jnp.zeros((rp.FEAT - rp.NUM_FIELDS, bins.e_pad), packed.dtype)],
            axis=0,
        )
        return proj, bins, packed, attrs_t

    proj, bins, packed, attrs_t = jax.block_until_ready(
        build(means, covs, harmonics, opacities)
    )
    # The jit boundary traced the NamedTuple's static ints into arrays;
    # restore them as Python ints (they're config constants).
    bins = bins._replace(
        e_pad=int(bins.e_pad), dup=int(bins.dup), base_dup=int(bins.base_dup),
        num_tiles_xy=num_tiles_xy,
    )
    e_pad = bins.e_pad
    print(f"# e_pad={e_pad} n_live={int(bins.n_live)} "
          f"overflow={int(bins.n_overflow)}", flush=True)

    fwd_out = jax.jit(
        lambda a: rp._fwd_call(a, bins.counts, bins.starts, num_tiles_xy,
                               chunk, e_pad, False, 1, unaligned=True)
    )(attrs_t)
    jax.block_until_ready(fwd_out)

    def scanned(body, *fixed):
        @jax.jit
        def run(seed, *args):
            def step(acc, kk):
                return acc + body(kk, *args), None

            acc, _ = jax.lax.scan(
                step, jnp.zeros((), jnp.float32), jax.random.split(seed, ITERS)
            )
            return acc

        return lambda seed: run(jax.random.PRNGKey(seed), *fixed)

    # 1. forward kernel alone (perturb attrs_t's opacity row cheaply)
    def body_fwd(kk, attrs_t):
        a = attrs_t.at[8].mul(1.0 + 1e-6 * jax.random.normal(kk, (e_pad,)))
        out = rp._fwd_call(a, bins.counts, bins.starts, num_tiles_xy, chunk,
                           e_pad, False, 1, unaligned=True)
        return jnp.sum(out[..., 0:5])

    # 2. backward kernel alone (perturbed cotangents)
    def body_bwd(kk, attrs_t, fwd_out):
        gout = jax.random.normal(kk, fwd_out.shape, fwd_out.dtype) * 1e-3
        d = rp._bwd_call(attrs_t, bins.counts, bins.starts, fwd_out, gout,
                         num_tiles_xy, chunk, e_pad, False, 1,
                         padded_capacity=False, unaligned=True)
        return jnp.sum(d[0]) + jnp.sum(d[9])

    # 3. scatter-set + two-tier dense sum (the accumulation glue)
    def body_scatter(kk, _unused):
        drows = jax.random.normal(kk, (e_pad, rp.NUM_FIELDS)) * 1e-3
        live = (jnp.arange(e_pad, dtype=jnp.int32) < bins.n_live)[:, None]
        drows = jnp.where(live, drows, 0.0)
        dup, base_dup = bins.dup, bins.base_dup or bins.dup
        dflat = jnp.zeros((g * dup, rp.NUM_FIELDS), drows.dtype)
        dflat = dflat.at[bins.flat].set(drows, unique_indices=True,
                                        mode="drop")
        split = g * base_dup
        extra = dup - base_dup
        dpacked = (
            dflat[:split].reshape(g, base_dup, rp.NUM_FIELDS).sum(axis=1)
            + dflat[split:].reshape(g, extra, rp.NUM_FIELDS).sum(axis=1)
        )
        return jnp.sum(dpacked)

    # 4. full composite VJP w.r.t. packed (kernel + gather-VJP + masks)
    def body_corevjp(kk, packed):
        p = packed * (1.0 + 1e-6 * jax.random.normal(kk, (1,)))

        def f(p):
            out = rp._prefix_core(
                p, bins.flat, bins.src, bins.src_order, bins.src_sorted,
                bins.counts, bins.starts, bins.n_live,
                num_tiles_xy, chunk, False, bins.dup,
                bins.base_dup or bins.dup,
            )
            return jnp.sum(out[..., 0:5] ** 2)

        return jnp.sum(jnp.abs(jax.grad(f)(p)))

    # 5. projection + SH VJP only (no compositing)
    def body_projvjp(kk, means, covs, harmonics, opacities):
        m = means + 1e-6 * jax.random.normal(kk, means.shape)

        def f(m, covs, harmonics, opacities):
            proj = project_gaussians(
                m, covs, harmonics, opacities, c2w, k, (h, w),
                sh_degree=None, use_sh=True,
            )
            xy = jnp.where(jnp.isfinite(proj.xy), proj.xy, 0.0)
            return (jnp.sum(xy ** 2) + jnp.sum(proj.conic ** 2)
                    + jnp.sum(proj.color ** 2))

        gs = jax.grad(f, argnums=(0, 1, 2, 3))(m, covs, harmonics, opacities)
        return sum(jnp.sum(jnp.abs(x)) * 1e-6 for x in gs)

    variants = {
        "fwd_kernel": scanned(body_fwd, attrs_t),
        "bwd_kernel": scanned(body_bwd, attrs_t, fwd_out),
        "scatter_glue": scanned(body_scatter, jnp.zeros(())),
        "core_vjp": scanned(body_corevjp, packed),
        "proj_vjp": scanned(body_projvjp, means, covs, harmonics, opacities),
    }

    results = {}
    for name, fn in variants.items():
        t0 = time.perf_counter()
        jax.block_until_ready(fn(0))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for s in (1, 2):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(s))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        results[name] = {"ms": round(best * 1e3, 2),
                         "compile_s": round(compile_s, 1)}
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
