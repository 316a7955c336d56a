"""A/B the rasterizer backends e2e fwd+bwd on the bench workload (1 cam).

Run: timeout 1400 python -u benchmarks/backend_compare.py
"""

from __future__ import annotations

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
    from spfsplatv2_tpu.ops.covariance import build_covariance
    from spfsplatv2_tpu.ops.rasterizer import RasterizerConfig, render

    h = w = 256
    g = 2 * h * w
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
    k1 = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])[None]
    e1 = jnp.eye(4)[None]
    near = jnp.ones((1,))
    far = jnp.full((1,), 100.0)
    bg = jnp.zeros((1, 3))
    tgt = jax.random.uniform(keys[6], (1, h, w, 3))

    for backend in ["pallas", "tiled"]:
        cfg = RasterizerConfig(
            backend=backend, scale_invariant=False, max_per_tile=2048,
            chunk=256, max_tiles_per_gaussian=16, entry_budget=2 * g,
        )

        @jax.jit
        def e2e_grad(m, c, h_, o, e, cfg=cfg):
            def f(m, c, h_, o, e):
                out = render(e, k1, near, far, (h, w), bg, m, c, h_, o,
                             cfg=cfg)
                return jnp.mean((out.color - tgt) ** 2)
            return jax.grad(f, argnums=(0, 1, 2, 3, 4))(m, c, h_, o, e)

        @jax.jit
        def fwd(m, c, h_, o, e, cfg=cfg):
            return render(e, k1, near, far, (h, w), bg, m, c, h_, o,
                          cfg=cfg).color

        t_f = timeit(fwd, means, covs, harmonics, opacities, e1)
        t_fb = timeit(e2e_grad, means, covs, harmonics, opacities, e1)
        print(f"{backend:16s} fwd {t_f:6.2f} ms   fwd+bwd {t_fb:6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
