"""512^2 / 1M-gaussian stretch benchmark (single chip).

The scaling stress point from SURVEY/BASELINE: 4 target views at 512x512
over 1M gaussians.  Round-1 fixed-stride path measured fwd 102.8 ms,
fwd+bwd 252 ms (1.04 Mpix/s) — dominated by the 16M-entry binning sort.
The compact layout sorts the same 16M duplicate slots but gathers only
~live entries.

Run: timeout 2400 env PYTHONPATH=/root/repo:/root/.axon_site \
  python -u benchmarks/bench512.py > /tmp/bench512b.log 2>&1
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def main() -> None:
    from spfsplatv2_tpu.ops.covariance import build_covariance
    from spfsplatv2_tpu.ops.rasterizer import RasterizerConfig, render

    h = w = 512
    n_targets = 4
    g = 1 << 20
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 8)
    means = jnp.concatenate(
        [
            jax.random.uniform(keys[0], (g, 2), minval=-1.5, maxval=1.5),
            jax.random.uniform(keys[1], (g, 1), minval=1.0, maxval=6.0),
        ],
        axis=-1,
    )
    scales = 0.001 + 0.005 * jax.random.uniform(keys[2], (g, 3))
    covs = build_covariance(scales, jax.random.normal(keys[3], (g, 4)))
    harmonics = 0.3 * jax.random.normal(keys[4], (g, 3, 25))
    opacities = jax.random.uniform(keys[5], (g,), minval=0.3, maxval=0.9)
    kmat = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])
    angles = jnp.linspace(-0.1, 0.1, n_targets)
    c2w = jnp.stack([jnp.eye(4).at[0, 3].set(float(a)) for a in angles])
    intr = jnp.stack([kmat] * n_targets)
    near = jnp.full((n_targets,), 1.0)
    far = jnp.full((n_targets,), 100.0)
    bg = jnp.zeros((n_targets, 3))
    target = jax.random.uniform(keys[6], (n_targets, h, w, 3))

    cfg = RasterizerConfig(
        backend="pallas", scale_invariant=True, max_per_tile=4096,
        chunk=256, max_tiles_per_gaussian=16, entry_budget=3 * g,
    )

    def loss_fn(means, covs, harmonics, opacities, c2w):
        out = render(c2w, intr, near, far, (h, w), bg,
                     means, covs, harmonics, opacities, cfg=cfg)
        return jnp.mean((out.color - target) ** 2)

    fwd = jax.jit(loss_fn)
    t0 = time.time()
    loss = float(fwd(means, covs, harmonics, opacities, c2w))
    print(f"512^2 fwd compile+run {time.time()-t0:.0f}s loss {loss:.4f}",
          flush=True)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(means, covs, harmonics, opacities, c2w)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"512^2 1M-gaussian fwd (4 cam): {ms:.1f} ms", flush=True)

    grad_fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    t0 = time.time()
    grads = jax.block_until_ready(grad_fn(means, covs, harmonics, opacities, c2w))
    print(f"grad compile+run {time.time()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        grads = grad_fn(means, covs, harmonics, opacities, c2w)
    jax.block_until_ready(grads)
    ms = (time.perf_counter() - t0) / iters * 1e3
    mpix = n_targets * h * w / (ms / 1e3) / 1e6
    print(f"512^2 fwd+bwd (4 cam): {ms:.1f} ms -> {mpix:.2f} Mpix/s",
          flush=True)


if __name__ == "__main__":
    main()
