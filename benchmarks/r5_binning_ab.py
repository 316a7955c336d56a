"""A/B the binning variants IN CONTEXT at the bench workload (round 5).

The round-4 sweep measured all binning knobs within +-1 ms at the e2e
level; this probe isolates the BINNING program (projection + binning +
checksums, the r5_dissect P1 program) so knob effects aren't drowned by
the other 10 ms of pipeline.

Run: timeout 2400 env PYTHONPATH=/root/repo:/root/.axon_site \
      python -u benchmarks/r5_binning_ab.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".xla_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp  # noqa: E402

from benchmarks.r5_dissect import make_scene, scanned  # noqa: E402

H = W = 256
G = 2 * H * W
CHUNK = 256


def main():
    from spfsplatv2_tpu.ops.raster_common import project_gaussians
    from spfsplatv2_tpu.ops.raster_tiled import bin_gaussians_prefix

    means, covs, harmonics, opacities, c2w, k = make_scene()
    out = {}

    variants = {
        "rank_a4_b2.0": dict(depth_key="rank", dup_a=4, budget=2.0),
        "quant_a4_b2.0": dict(depth_key="quantized", dup_a=4, budget=2.0),
        "rank_a2_b2.0": dict(depth_key="rank", dup_a=2, budget=2.0),
        "quant_a2_b2.0": dict(depth_key="quantized", dup_a=2, budget=2.0),
        "quant_a2_b1.75": dict(depth_key="quantized", dup_a=2, budget=1.75),
        "rank_a4_nosrcorder": dict(depth_key="rank", dup_a=4, budget=2.0,
                                   skip_src_order=True),
    }

    for name, v in variants.items():
        def run(m, v=v):
            proj = project_gaussians(
                m, covs, harmonics, opacities, c2w, k, (H, W),
                sh_degree=None, use_sh=True,
            )
            bins = bin_gaussians_prefix(
                proj, (H, W), 16, CHUNK,
                -(-int(v["budget"] * G) // 128) * 128,
                base_tiles_per_gaussian=v["dup_a"],
                big_pool_factor=0.125, depth_key=v["depth_key"],
            )
            acc = (jnp.sum(bins.counts).astype(jnp.float32)
                   + jnp.sum(bins.src).astype(jnp.float32)
                   + jnp.sum(proj.color))
            if not v.get("skip_src_order"):
                acc = acc + jnp.sum(bins.src_order).astype(jnp.float32)
            return acc

        out[name + "_ms"] = round(scanned(run, means) * 1e3, 3)
        print(json.dumps(out), flush=True)

    # --- batched-sort microbenchmark: is a (4, N) row-sort ~free vs (N,)?
    # If yes, batching the per-camera binning sorts across cameras is a
    # near-4x win on the sort stages.
    import time

    def time_sort(shape, n_payload, iters=20):
        key = jax.random.randint(jax.random.PRNGKey(0), shape, 0,
                                 1 << 26, dtype=jnp.int32)
        payload = jnp.arange(shape[-1], dtype=jnp.int32)
        payload = jnp.broadcast_to(payload, shape)

        @jax.jit
        def run(seed, key, payload):
            def step(acc, k):
                kk = key ^ jax.random.randint(k, (), 0, 1 << 20,
                                              dtype=jnp.int32)
                ops = (kk,) + (payload,) * n_payload
                sorted_ = jax.lax.sort(ops, dimension=key.ndim - 1,
                                       num_keys=1, is_stable=False)
                return acc + jnp.sum(sorted_[0][..., ::4096]).astype(
                    jnp.float32), None

            acc, _ = jax.lax.scan(step, jnp.zeros(()),
                                  jax.random.split(seed, iters))
            return acc

        def timed(s):
            t0 = time.perf_counter()
            jax.block_until_ready(run(jax.random.PRNGKey(s), key, payload))
            return (time.perf_counter() - t0) / iters

        timed(0)
        return min(timed(1), timed(2))

    for shape, np_ in (((720896,), 1), ((4, 720896), 1),
                       ((262144,), 1), ((4, 262144), 1),
                       ((131072,), 1), ((4, 131072), 1)):
        label = "x".join(map(str, shape)) + f"_p{np_}"
        out[f"sort_{label}_ms"] = round(time_sort(shape, np_) * 1e3, 3)
        print(json.dumps(out), flush=True)

    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
