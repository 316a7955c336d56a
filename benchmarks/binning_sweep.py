"""A/B sweep of binning options on the bench workload (device-side timing).

Sweeps RasterizerConfig knobs against the round-4 baseline (rank key,
dup_a=4, pool 0.125 -> 14.2 ms/camera fwd+bwd):

  * depth_key="quantized"  — no per-camera double argsort (VERDICT r3 #8:
    the option shipped without a recorded number)
  * base_tiles_per_gaussian=2, big_pool_factor=0.25 — smaller expansion
    sort (g*2 + g/4*14 = 721k -> same? no: 262k + 459k... see math below)
  * dup_a=2 pool 0.125 — 262k + 196k = 458k-slot sort
  * single-tier (dup_a=None): 2M-slot sort, the pre-round-3 layout

Emits ms/camera fwd+bwd for each; parity is covered by unit tests
(test_raster_pallas: two-tier == single-tier exactly; quantized ==
rank to compositing tolerance).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3400 \
       python -u benchmarks/binning_sweep.py
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
    from spfsplatv2_tpu.ops.covariance import build_covariance
    from spfsplatv2_tpu.ops.rasterizer import RasterizerConfig, render

    h = w = 256
    views = 2
    n_targets = 4
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
    angles = jnp.linspace(-0.1, 0.1, n_targets)
    c2w = jnp.stack([jnp.eye(4).at[0, 3].set(float(a)) for a in angles])
    intr = jnp.stack([k] * n_targets)
    near = jnp.full((n_targets,), 1.0)
    far = jnp.full((n_targets,), 100.0)
    bg = jnp.zeros((n_targets, 3))
    target = jax.random.uniform(keys[6], (n_targets, h, w, 3))

    def make_fn(cfg):
        def loss_fn(means, covs, harmonics, opacities, c2w):
            out = render(
                c2w, intr, near, far, (h, w), bg,
                means, covs, harmonics, opacities, cfg=cfg,
            )
            return jnp.mean((out.color - target) ** 2)

        @jax.jit
        def run(seed, means, covs, harmonics, opacities, c2w):
            def step(acc, kk):
                m = means + 1e-6 * jax.random.normal(kk, means.shape)
                grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
                    m, covs, harmonics, opacities, c2w
                )
                return acc + jnp.sum(jnp.abs(grads[0][0])) + jnp.sum(
                    jnp.abs(grads[4][0, 0])
                ), None

            acc, _ = jax.lax.scan(
                step, jnp.zeros((), jnp.float32), jax.random.split(seed, ITERS)
            )
            return acc

        return run

    base = dict(backend="auto", scale_invariant=True, max_per_tile=2048,
                chunk=256, max_tiles_per_gaussian=16, entry_budget=2 * g)
    sweep = {
        "baseline_rank_a4_p125": RasterizerConfig(**base),
        "quantized_a4_p125": RasterizerConfig(**base, depth_key="quantized"),
        "rank_a2_p125": RasterizerConfig(**base, base_tiles_per_gaussian=2),
        "rank_a2_p25": RasterizerConfig(**base, base_tiles_per_gaussian=2,
                                        big_pool_factor=0.25),
        "quantized_a2_p25": RasterizerConfig(
            **base, depth_key="quantized", base_tiles_per_gaussian=2,
            big_pool_factor=0.25),
        "single_tier": RasterizerConfig(**base, base_tiles_per_gaussian=None),
    }
    results = {}
    for name, cfg in sweep.items():
        fn = make_fn(cfg)
        try:
            t0 = time.perf_counter()
            jax.block_until_ready(
                fn(jax.random.PRNGKey(0), means, covs, harmonics, opacities,
                   c2w)
            )
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for s in (1, 2):
                t0 = time.perf_counter()
                jax.block_until_ready(
                    fn(jax.random.PRNGKey(s), means, covs, harmonics,
                       opacities, c2w)
                )
                best = min(best, (time.perf_counter() - t0) / ITERS)
            results[name] = {
                "ms_per_cam": round(best / n_targets * 1e3, 2),
                "mpix_s": round(n_targets * h * w / best / 1e6, 2),
                "compile_s": round(compile_s, 1),
            }
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
