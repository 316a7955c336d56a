"""A/B the backward-accumulation stages IN CONTEXT (round 5).

Variants of the full 1-camera fwd+bwd program that surgically remove one
backward-accumulation stage each (numerics become wrong — only timing
matters; the checksum still touches every pipeline stage):

  full       — production path (permute-gather + sorted segment-sum)
  no_segsum  — permute-gather kept, segment-sum replaced by a slice
  no_accum   — both replaced by a slice (ceiling for accumulation savings)
  no_bwdk    — backward kernel replaced by reusing attrs_t as fake grads
               (measures the bwd kernel's in-context cost)

Run: timeout 2400 env PYTHONPATH=/root/repo:/root/.axon_site \
      python -u benchmarks/r5_accum_ab.py
"""

from __future__ import annotations

import functools
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

from benchmarks.r5_dissect import ITERS, make_scene, scanned  # noqa: E402

H = W = 256
G = 2 * H * W
CHUNK = 256


def make_variant(variant: str):
    from spfsplatv2_tpu.ops.raster_pallas import (
        FEAT, NUM_FIELDS, _bwd_call, _fwd_call,
    )

    @functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
    def core(packed, flat_p, src, src_order, src_sorted, counts, starts,
             n_live, num_tiles_xy, chunk):
        e_pad = flat_p.shape[0]
        rows = packed[src]
        attrs_t = jnp.concatenate(
            [rows.T, jnp.zeros((FEAT - NUM_FIELDS, e_pad), packed.dtype)],
            axis=0,
        )
        return _fwd_call(attrs_t, counts, starts, num_tiles_xy, chunk,
                         e_pad, False, 1, unaligned=True)

    def core_fwd(packed, flat_p, src, src_order, src_sorted, counts, starts,
                 n_live, num_tiles_xy, chunk):
        out = core(packed, flat_p, src, src_order, src_sorted, counts,
                   starts, n_live, num_tiles_xy, chunk)
        e_pad = flat_p.shape[0]
        rows = packed[src]
        attrs_t = jnp.concatenate(
            [rows.T, jnp.zeros((FEAT - NUM_FIELDS, e_pad), packed.dtype)],
            axis=0,
        )
        return out, (packed, src_order, src_sorted, attrs_t, counts, starts,
                     n_live, out)

    def core_bwd(num_tiles_xy, chunk, residuals, g):
        (packed, src_order, src_sorted, attrs_t, counts, starts, n_live,
         fwd_out) = residuals
        n_gauss = packed.shape[0]
        e_pad = attrs_t.shape[1]
        if variant == "no_bwdk":
            dattrs_t = attrs_t * jnp.sum(g)  # fake, same shape
        else:
            dattrs_t = _bwd_call(attrs_t, counts, starts, fwd_out, g,
                                 num_tiles_xy, chunk, e_pad, False, 1,
                                 padded_capacity=False, unaligned=True)
        drows = dattrs_t[:NUM_FIELDS, :].T
        live = (jnp.arange(e_pad, dtype=jnp.int32) < n_live)[:, None]
        drows = jnp.where(live, drows, 0.0)
        if variant == "no_accum":
            dpacked = drows[:n_gauss]
        elif variant == "no_segsum":
            dpacked = drows[src_order][:n_gauss]
        else:  # full / no_bwdk
            drows_s = drows[src_order]
            dpacked = jax.ops.segment_sum(
                drows_s, src_sorted, num_segments=n_gauss + 1,
                indices_are_sorted=True,
            )[:n_gauss]
        return (dpacked,) + (None,) * 7

    core.defvjp(core_fwd, core_bwd)
    return core


def main():
    from spfsplatv2_tpu.ops.raster_common import project_gaussians
    from spfsplatv2_tpu.ops.raster_tiled import bin_gaussians_prefix

    means, covs, harmonics, opacities, c2w, k = make_scene()
    out = {}

    for variant in ("full", "no_segsum", "no_accum", "no_bwdk"):
        core = make_variant(variant)

        def run(m):
            proj = project_gaussians(
                m, covs, harmonics, opacities, c2w, k, (H, W),
                sh_degree=None, use_sh=True,
            )
            bins = bin_gaussians_prefix(
                proj, (H, W), 16, CHUNK, 2 * G, base_tiles_per_gaussian=4,
                big_pool_factor=0.125, depth_key="rank",
            )
            packed = jnp.concatenate(
                [proj.xy, proj.conic, proj.color, proj.opacity[:, None],
                 proj.depth[:, None]], axis=-1,
            )

            def loss(p):
                o = core(p, bins.flat, bins.src, bins.src_order,
                         bins.src_sorted, bins.counts, bins.starts,
                         bins.n_live, bins.num_tiles_xy, CHUNK)
                return jnp.mean(o ** 2)

            gp = jax.grad(loss)(packed)
            return jnp.sum(jnp.abs(gp))

        out[f"{variant}_ms"] = round(scanned(run, means) * 1e3, 3)
        print(json.dumps(out), flush=True)

    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
