"""Pallas kernels vs oracle: forward images and gradients allclose.

Exercises the DEFAULT production layout (prefix: the binning sort's live
prefix is the slot space, `bin_gaussians_prefix` +
`composite_pallas_prefix`) directly against the dense reference
compositor.  Runs the TPU kernels in interpret mode on CPU (the same code
path compiles on real TPU hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spfsplatv2_tpu.ops.raster_common import project_gaussians
from spfsplatv2_tpu.ops.raster_pallas import composite_pallas_prefix
from spfsplatv2_tpu.ops.raster_ref import composite_reference
from spfsplatv2_tpu.ops.raster_tiled import bin_gaussians_prefix

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from test_rasterizer import CAMERA_K, assert_images_close, make_scene  # noqa: E402


def prefix_composite(proj, hw, bg, chunk=64, dup=32, budget=None, base=None,
                     pool_factor=0.125, depth_key="rank"):
    g = proj.xy.shape[0]
    if budget is None:
        budget = g * dup
    bins = bin_gaussians_prefix(proj, hw, dup, chunk, budget,
                                base_tiles_per_gaussian=base,
                                big_pool_factor=pool_factor,
                                depth_key=depth_key)
    return composite_pallas_prefix(proj, bins, hw, bg, chunk=chunk,
                                   interpret=True)


def run_both(n=150, h=48, w=48, seed=0, chunk=64, base=None):
    means, covs, harm, op = make_scene(jax.random.PRNGKey(seed), n=n)
    bg = jnp.asarray([0.15, 0.25, 0.35])
    proj = project_gaussians(means, covs, harm, op, jnp.eye(4), CAMERA_K, (h, w))
    ref = composite_reference(proj, (h, w), bg)
    pal = prefix_composite(proj, (h, w), bg, chunk=chunk, base=base)
    return proj, ref, pal, bg


class TestPrefixForward:
    @pytest.mark.parametrize("base", [None, 2])
    def test_matches_reference(self, base):
        _, ref, pal, _ = run_both(base=base)
        assert_images_close(pal[0], ref[0], atol=3e-5)   # color
        assert_images_close(pal[1], ref[1], atol=3e-4, hard_atol=2e-2)  # depth
        assert_images_close(pal[2], ref[2], atol=3e-5)   # alpha

    def test_two_tier_equals_single_tier_exactly(self):
        # Two-tier expansion materializes the SAME (tile, depth-rank) key
        # set from different slot ids -> bit-identical images when the
        # pool holds every big gaussian.
        proj, _, pal1, bg = run_both(n=120, seed=7)
        pal2 = prefix_composite(proj, (48, 48), bg, base=2, pool_factor=1.0)
        for a, b in zip(pal1, pal2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_quantized_depth_key_matches_reference(self):
        # 22-bit quantized depth keys preserve the compositing order up to
        # ~1e-4-relative-depth ties; on a random scene the result matches
        # the exact-rank path to float tolerance.
        proj, ref, _, bg = run_both(n=150, seed=11)
        pal = prefix_composite(proj, (48, 48), bg, depth_key="quantized")
        assert_images_close(pal[0], ref[0], atol=3e-5)
        assert_images_close(pal[2], ref[2], atol=3e-5)

    def test_pool_exhaustion_counts_overflow(self):
        # A pool far smaller than the number of big gaussians must surface
        # the unmaterialized tiles in n_overflow (never silently).
        means, covs, harm, op = make_scene(jax.random.PRNGKey(9), n=150)
        covs = covs * 25.0  # inflate footprints so most gaussians are big
        proj = project_gaussians(means, covs, harm, op, jnp.eye(4), CAMERA_K,
                                 (48, 48))
        dup, chunk = 32, 64
        full = bin_gaussians_prefix(proj, (48, 48), dup, chunk, 150 * dup,
                                    base_tiles_per_gaussian=2,
                                    big_pool_factor=1.0)
        tiny = bin_gaussians_prefix(proj, (48, 48), dup, chunk, 150 * dup,
                                    base_tiles_per_gaussian=2,
                                    big_pool_factor=0.0)  # pool=min(g,64)
        lost = int(full.n_live) - int(tiny.n_live)
        assert lost > 0, "test scene must exhaust the pool"
        assert int(tiny.n_overflow) - int(full.n_overflow) == lost

    def test_empty_tiles(self):
        # Scene confined to one corner: most tiles have zero entries.
        means = jnp.asarray([[-0.6, -0.6, 2.0]])
        covs = jnp.eye(3)[None] * 0.01
        harm = jnp.ones((1, 3, 1))
        op = jnp.asarray([0.9])
        bg = jnp.asarray([0.5, 0.5, 0.5])
        h = w = 48
        proj = project_gaussians(means, covs, harm, op, jnp.eye(4), CAMERA_K, (h, w))
        ref = composite_reference(proj, (h, w), bg)
        pal = prefix_composite(proj, (h, w), bg, chunk=64, dup=16)
        assert_images_close(pal[0], ref[0], atol=3e-5)


class TestPrefixBackward:
    @pytest.mark.parametrize("base", [None, 2])
    def test_grads_match_oracle(self, base):
        h = w = 48
        means, covs, harm, op = make_scene(jax.random.PRNGKey(3), n=100, d_sh=4)
        bg = jnp.zeros((3,))
        target = jax.random.uniform(jax.random.PRNGKey(4), (h, w, 3))

        def loss(backend, m, c, hh, o, c2w):
            proj = project_gaussians(m, c, hh, o, c2w, CAMERA_K, (h, w))
            if backend == "ref":
                col, dep, alp = composite_reference(proj, (h, w), bg)
            else:
                col, dep, alp = prefix_composite(proj, (h, w), bg, chunk=64,
                                                 base=base)
            return (
                jnp.mean((col - target) ** 2)
                + 0.01 * jnp.mean(dep)
                + 0.05 * jnp.mean(alp)
            )

        args = (means, covs, harm, op, jnp.eye(4))
        g_ref = jax.grad(lambda *a: loss("ref", *a), argnums=(0, 1, 2, 3, 4))(*args)
        g_pal = jax.grad(lambda *a: loss("pal", *a), argnums=(0, 1, 2, 3, 4))(*args)
        names = ["means", "covs", "harmonics", "opacity", "pose"]
        for name, a, b in zip(names, g_ref, g_pal):
            scale = float(jnp.abs(jnp.asarray(a)).max()) + 1e-12
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-3 * scale + 1e-8,
                err_msg=name,
            )

    def test_early_termination_grads_zeroed(self):
        # Many opaque gaussians stacked: tail entries past the T=1e-4 stop
        # must receive exactly zero gradient (not garbage memory).
        h = w = 16
        n = 64
        means = jnp.concatenate(
            [jnp.zeros((n, 2)), jnp.linspace(1.0, 3.0, n)[:, None]], axis=-1
        )
        covs = jnp.broadcast_to(jnp.eye(3) * 0.05, (n, 3, 3))
        harm = jax.random.normal(jax.random.PRNGKey(1), (n, 3, 1))
        op = jnp.full((n,), 0.95)
        bg = jnp.zeros((3,))

        def loss(backend, harm):
            proj = project_gaussians(
                means, covs, harm, op, jnp.eye(4), CAMERA_K, (h, w)
            )
            if backend == "ref":
                col, _, _ = composite_reference(proj, (h, w), bg)
            else:
                col, _, _ = prefix_composite(proj, (h, w), bg, chunk=32,
                                             dup=16)
            return jnp.sum(col)

        g_ref = jax.grad(lambda x: loss("ref", x))(harm)
        g_pal = jax.grad(lambda x: loss("pal", x))(harm)
        scale = float(jnp.abs(g_ref).max())
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   atol=1e-4 * scale + 1e-6)
        # The far tail (occluded) must be ~zero — garbage from unwritten
        # gradient slots would be arbitrarily large. Tiny nonzeros are
        # legitimate T=1e-4 boundary flips vs the oracle (f32 log-cumsum vs
        # direct cumprod).
        assert float(jnp.abs(g_pal[-4:]).max()) < 1e-4

    def test_tight_budget_grads_stay_finite(self):
        # Budget overflow drops the deepest entries; gradients must stay
        # finite and the dropped entries contribute exactly zero.
        h = w = 32
        means, covs, harm, op = make_scene(jax.random.PRNGKey(5), n=200)
        bg = jnp.zeros((3,))

        def loss(harm):
            proj = project_gaussians(
                means, covs, harm, op, jnp.eye(4), CAMERA_K, (h, w)
            )
            col, _, _ = prefix_composite(
                proj, (h, w), bg, chunk=32, dup=16, budget=128
            )
            return jnp.sum(col)

        g = jax.grad(loss)(harm)
        assert bool(jnp.isfinite(g).all())
