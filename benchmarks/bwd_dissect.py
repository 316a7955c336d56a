"""Dissect the rasterizer BACKWARD cost by gradient subset (device-side).

The round-4 device-side bench (trusted regime: one lax.scan dispatch over
perturbed inputs + checksum fetch) puts the 4-camera fwd+bwd at ~40 ms per
camera with the backward at ~38 ms — far above the ~13 ms the round-2
queued-dispatch probes claimed (identical queued executions are partially
served free by the tunnel; PERFORMANCE.md measurement rules).

This probe times the same workload with gradients restricted to subsets of
(means, covs, harmonics, opacities, c2w).  Each subset DCEs the unused VJP
branches, so differences isolate where the backward time actually goes.

Run: timeout 3000 python -u benchmarks/bwd_dissect.py
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


def main():
    from spfsplatv2_tpu.ops.covariance import build_covariance
    from spfsplatv2_tpu.ops.rasterizer import RasterizerConfig, render

    h = w = 256
    views = 2
    n_targets = 4
    g = views * h * w
    iters = 20

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

    cfg = RasterizerConfig(
        backend="auto", scale_invariant=True, max_per_tile=2048, chunk=256,
        max_tiles_per_gaussian=16, entry_budget=2 * g,
    )

    def loss_fn(means, covs, harmonics, opacities, c2w):
        out = render(
            c2w, intr, near, far, (h, w), bg,
            means, covs, harmonics, opacities, cfg=cfg,
        )
        return jnp.mean((out.color - target) ** 2)

    def scanned(body):
        @jax.jit
        def run(seed, means, covs, harmonics, opacities, c2w):
            def step(acc, kk):
                m = means + 1e-6 * jax.random.normal(kk, means.shape,
                                                     means.dtype)
                return acc + body(m, covs, harmonics, opacities, c2w), None

            acc, _ = jax.lax.scan(
                step, jnp.zeros((), jnp.float32), jax.random.split(seed, iters)
            )
            return acc

        return run

    def fwd_only(m, covs, harmonics, opacities, c2w):
        out = render(c2w, intr, near, far, (h, w), bg,
                     m, covs, harmonics, opacities, cfg=cfg)
        return jnp.sum(out.color) + jnp.sum(out.depth) + jnp.sum(out.alpha)

    def grad_subset(argnums):
        def body(m, covs, harmonics, opacities, c2w):
            grads = jax.grad(loss_fn, argnums=argnums)(
                m, covs, harmonics, opacities, c2w
            )
            return sum(jnp.sum(jnp.abs(x)) * 1e-6 for x in grads)

        return body

    variants = {
        "fwd_only": scanned(fwd_only),
        "grad_all": scanned(grad_subset((0, 1, 2, 3, 4))),
        "grad_means": scanned(grad_subset((0,))),
        "grad_covs": scanned(grad_subset((1,))),
        "grad_sh": scanned(grad_subset((2,))),
        "grad_opac": scanned(grad_subset((3,))),
        "grad_pose": scanned(grad_subset((4,))),
    }

    results = {}
    for name, fn in variants.items():
        t0 = time.perf_counter()
        jax.block_until_ready(
            fn(jax.random.PRNGKey(0), means, covs, harmonics, opacities, c2w)
        )
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for s in (1, 2):
            t0 = time.perf_counter()
            jax.block_until_ready(
                fn(jax.random.PRNGKey(s), means, covs, harmonics, opacities,
                   c2w)
            )
            best = min(best, (time.perf_counter() - t0) / iters)
        results[name] = {
            "ms_per_cam": round(best / n_targets * 1e3, 2),
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
