"""Trustworthy device timings via dependency-chained lax.scan.

The axon tunnel appears to dedupe/cache repeated identical executions, so
naive dispatch-loop timing is unreliable (the same gather measured 0.04 ms
and 3.15 ms in different scripts).  Here every iteration's input depends on
the previous output inside ONE compiled scan, so all N iterations must
really execute; timing (scan_N2 - scan_N1) / (N2 - N1) cancels fixed costs.

Run: timeout 2400 python -u benchmarks/true_cost.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def chained_ms(op, init, n1=4, n2=12):
    """op: carry -> carry. Returns per-iter ms from the two-point fit."""

    def runner(n):
        @jax.jit
        def run(c):
            return jax.lax.fori_loop(0, n, lambda i, c: op(c), c)

        out = run(init)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(init)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    t1 = runner(n1)
    t2 = runner(n2)
    return (t2 - t1) / (n2 - n1) * 1e3


def main():
    rng = np.random.default_rng(0)
    g = 131072
    e_cap = 524288

    # ---- 1. row gather (524288, 16) from (131072, 16)
    table = jnp.asarray(rng.normal(size=(g, 16)), np.float32)
    ids = jnp.asarray(rng.integers(0, g, e_cap), jnp.int32)

    def op_gather(carry):
        table, ids = carry
        out = table[ids]                       # (E, 16)
        # fold the output back into the table so the next iter depends on it
        table = table + out[:g] * 1e-12
        ids = (ids + 1) % g
        return (table, ids)

    ms = chained_ms(op_gather, (table, ids))
    print(f"1 row gather 524k x 16 f32: {ms:.3f} ms/iter", flush=True)

    # ---- 2. duplicate scatter-add 524k rows -> (g, 16)
    dattrs = jnp.asarray(rng.normal(size=(e_cap, 16)), np.float32)

    def op_scatter(carry):
        acc, dattrs, ids = carry
        out = jnp.zeros((g, 16), jnp.float32).at[ids].add(dattrs)
        return (acc + out * 1e-12, dattrs + 1e-12, (ids + 1) % g)

    ms = chained_ms(op_scatter, (table, dattrs, ids))
    print(f"2 dup scatter-add 524k x 16: {ms:.3f} ms/iter", flush=True)

    # ---- 3. 2-stream stable sort of 2M entries (9-bit keys)
    keys0 = jnp.asarray(rng.integers(0, 257, 2097152), jnp.int32)
    vals0 = jnp.asarray(rng.integers(0, g, 2097152), jnp.int32)

    def op_sort(carry):
        keys, vals = carry
        ks, vs = jax.lax.sort((keys, vals), dimension=0, num_keys=1,
                              is_stable=True)
        return ((ks + vs[0] % 2) % 257, vs)

    ms = chained_ms(op_sort, (keys0, vals0), n1=2, n2=8)
    print(f"3 stable sort 2M (key+payload): {ms:.3f} ms/iter", flush=True)

    # ---- 4. full e2e grad chained through means
    from spfsplatv2_tpu.ops.covariance import build_covariance
    from spfsplatv2_tpu.ops.rasterizer import RasterizerConfig, render

    h = w = 256
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 8)
    n_g = 2 * h * w
    means = jnp.concatenate(
        [
            jax.random.uniform(keys[0], (n_g, 2), minval=-1.5, maxval=1.5),
            jax.random.uniform(keys[1], (n_g, 1), minval=1.0, maxval=6.0),
        ],
        axis=-1,
    )
    scales = 0.002 + 0.01 * jax.random.uniform(keys[2], (n_g, 3))
    covs = build_covariance(scales, jax.random.normal(keys[3], (n_g, 4)))
    harmonics = 0.3 * jax.random.normal(keys[4], (n_g, 3, 25))
    opacities = jax.random.uniform(keys[5], (n_g,), minval=0.3, maxval=0.9)
    kmat = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])
    cfg = RasterizerConfig(backend="pallas", scale_invariant=False,
                           max_per_tile=2048, chunk=256,
                           max_tiles_per_gaussian=16)
    near = jnp.ones((1,)); far = jnp.full((1,), 100.0)
    bg = jnp.zeros((1, 3))
    e1 = jnp.eye(4)[None]; k1 = kmat[None]
    tgt = jax.random.uniform(keys[6], (1, h, w, 3))

    def loss(m, c, hh, o, e):
        out = render(e, k1, near, far, (h, w), bg, m, c, hh, o, cfg=cfg)
        return jnp.mean((out.color - tgt) ** 2)

    def op_e2e(carry):
        m = carry
        gm = jax.grad(loss, argnums=0)(m, covs, harmonics, opacities, e1)
        return m + 1e-9 * gm

    ms = chained_ms(op_e2e, means, n1=2, n2=6)
    print(f"4 e2e fwd+bwd (1 cam, chained): {ms:.2f} ms/iter "
          f"(4-cam {4*h*w/(4*ms/1e3)/1e6:.2f} Mpix/s)", flush=True)

    # ---- 5. e2e forward only, chained
    def op_fwd(carry):
        m = carry
        out = render(e1, k1, near, far, (h, w), bg, m, covs, harmonics,
                     opacities, cfg=cfg)
        return m + 1e-9 * out.color[0, :n_g // 256].reshape(-1, 3)[:n_g]

    # simpler dependency: add a scalar from the render
    def op_fwd2(carry):
        m = carry
        out = render(e1, k1, near, far, (h, w), bg, m, covs, harmonics,
                     opacities, cfg=cfg)
        return m + 1e-12 * jnp.mean(out.color)

    ms = chained_ms(op_fwd2, means, n1=2, n2=6)
    print(f"5 e2e fwd only (1 cam, chained): {ms:.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
