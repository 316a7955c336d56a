"""Characterize axon-tunnel dispatch: per-call overhead vs device time.

Times three programs (trivial, medium, heavy) at iters 1/20/100, twice
each. If ms/call is constant in iters, dispatch pipelines; if wall/call
shrinks with iters, there is fixed per-batch overhead; run-to-run deltas
expose cache effects.
"""

import time

import jax
import jax.numpy as jnp


def bench(fn, args, iters):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from spfsplatv2_tpu.ops.covariance import build_covariance
    from spfsplatv2_tpu.ops.raster_common import project_gaussians

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 8)
    h = w = 256
    g = 2 * h * w
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

    small = jnp.ones((128, 128))
    trivial = jax.jit(lambda x: x + 1.0)

    proj = jax.jit(lambda m, c, hh, o: project_gaussians(
        m, c, hh, o, c2w, k, (h, w), sh_degree=None, use_sh=True))

    # big-output program: return a fresh 64MB buffer
    bigout = jax.jit(lambda x: jnp.broadcast_to(x[None, None], (1024, 16, 128, 128)) * 2.0)

    for name, fn, args in (
        ("trivial(128x128)", trivial, (small,)),
        ("proj(131k)", proj, (means, covs, harmonics, opacities)),
        ("bigout(64MB)", bigout, (small,)),
    ):
        for iters in (1, 20, 100):
            for trial in range(2):
                t = bench(fn, args, iters)
                print(f"{name} iters={iters} trial={trial}: {t:.3f} ms/call",
                      flush=True)


if __name__ == "__main__":
    main()
