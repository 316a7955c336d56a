"""Minimal fresh-process e2e fwd+bwd timing (bench.py workload, 1 camera).

Cross-checks benchmarks/raster_stages.py, whose in-script stage timings
proved contaminated (same binning: 8.8 ms there, 0.03 ms standalone).
"""

import time

import jax
import jax.numpy as jnp


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
    k = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])
    cfg = RasterizerConfig(backend="pallas", scale_invariant=False,
                           max_per_tile=2048, chunk=256,
                           max_tiles_per_gaussian=16)
    near = jnp.ones((1,)); far = jnp.full((1,), 100.0)
    bg = jnp.zeros((1, 3))
    e1 = jnp.eye(4)[None]; k1 = k[None]
    tgt = jax.random.uniform(keys[6], (1, h, w, 3))

    @jax.jit
    def e2e_grad(m, c, h_, o, e):
        def f(m, c, h_, o, e):
            out = render(e, k1, near, far, (h, w), bg, m, c, h_, o, cfg=cfg)
            return jnp.mean((out.color - tgt) ** 2)
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(m, c, h_, o, e)

    out = e2e_grad(means, covs, harmonics, opacities, e1)
    jax.block_until_ready(out)

    for trial in range(3):
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            out = e2e_grad(means, covs, harmonics, opacities, e1)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"trial {trial}: e2e fwd+bwd 1 cam: {dt:.2f} ms "
              f"(4-cam equiv {4*h*w/(4*dt/1e3)/1e6:.2f} Mpix/s)", flush=True)

    @jax.jit
    def fwd(m, c, h_, o):
        return render(e1, k1, near, far, (h, w), bg, m, c, h_, o,
                      cfg=cfg).color
    out = fwd(means, covs, harmonics, opacities)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = fwd(means, covs, harmonics, opacities)
    jax.block_until_ready(out)
    print(f"fwd only: {(time.perf_counter()-t0)/20*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
