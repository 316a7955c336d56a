"""Head-to-head: unrolled per-camera pipeline vs flat batched pipeline.

Times (on the real TPU) forward and forward+backward for both formulations
at the bench shape (4 cams, 256^2, 131k gaussians), plus stage splits for
the batched path, using the chained-iteration harness (timing one jit that
runs the op N times back-to-back, avoiding per-call dispatch noise).
"""

import time

import jax
import jax.numpy as jnp

from spfsplatv2_tpu.ops.covariance import build_covariance
from spfsplatv2_tpu.ops.raster_common import project_gaussians
from spfsplatv2_tpu.ops.raster_pallas import (
    composite_pallas,
    composite_pallas_batched,
)
from spfsplatv2_tpu.ops.raster_tiled import bin_gaussians, bin_gaussians_batched

N_CAM = 4
H = W = 256
G = 131072
MPT = 2048
CHUNK = 128
DUP = 16

CAMERA_K = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])


def scene(key):
    ks = jax.random.split(key, 6)
    means = jnp.concatenate(
        [
            jax.random.uniform(ks[0], (G, 2), minval=-0.9, maxval=0.9),
            jax.random.uniform(ks[1], (G, 1), minval=1.0, maxval=8.0),
        ],
        axis=-1,
    )
    scales = 0.002 + 0.006 * jax.random.uniform(ks[2], (G, 3))
    covs = build_covariance(scales, jax.random.normal(ks[3], (G, 4)))
    harm = 0.3 * jax.random.normal(ks[4], (G, 3, 25))
    op = jax.random.uniform(ks[5], (G,), minval=0.2, maxval=0.9)
    return means, covs, harm, op


def chained_ms(fn, *args, iters=8):
    """Time one jit executing fn iters times with data dependencies."""

    def many(*a):
        acc = 0.0
        for i in range(iters):
            acc = acc + fn(jax.tree.map(lambda x: x + acc * 0, a[0]), *a[1:])
        return acc

    j = jax.jit(many)
    r = j(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = j(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    means, covs, harm, op = scene(jax.random.PRNGKey(0))
    c2w = jnp.broadcast_to(jnp.eye(4), (N_CAM, 4, 4))
    intr = jnp.broadcast_to(CAMERA_K, (N_CAM, 3, 3))
    bg = jnp.zeros((N_CAM, 3))
    meansb = jnp.broadcast_to(means[None], (N_CAM, G, 3))
    target = jax.random.uniform(jax.random.PRNGKey(9), (N_CAM, H, W, 3))

    def fwd_unrolled(means4, covs, harm, op):
        outs = []
        for i in range(N_CAM):
            proj = project_gaussians(
                means4[i], covs, harm, op, c2w[i], intr[i], (H, W)
            )
            bins = bin_gaussians(proj, (H, W), DUP)
            col, dep, alp = composite_pallas(
                proj, bins, (H, W), bg[i], chunk=CHUNK, max_per_tile=MPT
            )
            outs.append(col)
        return jnp.stack(outs)

    def fwd_batched(means4, covs, harm, op):
        project = lambda m, e, k: project_gaussians(  # noqa: E731
            m, covs, harm, op, e, k, (H, W)
        )
        proj = jax.vmap(project)(means4, c2w, intr)
        bins = bin_gaussians_batched(proj, (H, W), DUP)
        col, dep, alp = composite_pallas_batched(
            proj, bins, (H, W), bg, chunk=CHUNK, max_per_tile=MPT
        )
        return col

    for name, fn in [("unrolled", fwd_unrolled), ("batched", fwd_batched)]:
        ms = chained_ms(lambda m, *a, f=fn: jnp.sum(f(m, *a)), meansb, covs,
                        harm, op, iters=4)
        print(f"fwd  {name}: {ms:8.2f} ms")

        def loss(m, covs=covs, harm=harm, op=op, f=fn):
            return jnp.sum((f(m, covs, harm, op) - target) ** 2)

        g = jax.grad(loss)
        ms = chained_ms(lambda m: jnp.sum(g(m)), meansb, iters=4)
        mpix = N_CAM * H * W / (ms / 1e3) / 1e6
        print(f"f+b  {name}: {ms:8.2f} ms   ({mpix:.2f} Mpix/s)")

    # Stage split for the batched path (forward only).
    project = lambda m, e, k: project_gaussians(  # noqa: E731
        m, covs, harm, op, e, k, (H, W)
    )

    def stage_proj(m):
        return jax.vmap(project)(m, c2w, intr)

    proj = jax.jit(stage_proj)(meansb)
    jax.block_until_ready(proj)

    def stage_bin(proj):
        b = bin_gaussians_batched(proj, (H, W), DUP)
        return b.ids_sorted, b.tile_starts, b.order

    def stage_all(m):
        p = stage_proj(m)
        b = bin_gaussians_batched(p, (H, W), DUP)
        return composite_pallas_batched(
            p, b, (H, W), bg, chunk=CHUNK, max_per_tile=MPT
        )[0]

    print(f"stage proj : {chained_ms(lambda m: jnp.sum(stage_proj(m)[0]), meansb, iters=4):8.2f} ms")
    print(f"stage bin  : {chained_ms(lambda p: stage_bin(p)[0].sum(), proj, iters=4):8.2f} ms (given proj)")


if __name__ == "__main__":
    main()
