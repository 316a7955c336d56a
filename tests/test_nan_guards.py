"""Gradient NaN guards for degenerate / runaway model states.

Found via the round-3 flagship overfit collapse: the pts3d exp
parameterization ran the raw norm away (18 -> 72 in 20 warmup steps),
every point left the frustum (render grads exactly zero), and the
reprojection loss produced NaN grads via inf/inf in the pixel-norm VJP —
so the NaN-skip froze training forever.  These tests pin the guards that
make that state impossible (bounded distances) and recoverable (finite
gradients everywhere).
"""

import jax
import jax.numpy as jnp
import numpy as np

from spfsplatv2_tpu.losses.reproj import ReprojConfig, reproj_loss
from spfsplatv2_tpu.models.heads.postprocess import D_CAP, pts3d_postprocess


class TestReprojFinite:
    def _loss(self, pts):
        b, h, w, _ = pts.shape
        k = jnp.broadcast_to(
            jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]),
            (b, 3, 3),
        )
        c2w = jnp.broadcast_to(jnp.eye(4), (b, 4, 4))
        return reproj_loss(pts, c2w, k, jnp.asarray(100), ReprojConfig())

    def test_runaway_points_keep_grads_finite(self):
        # Points at 1e31 (the observed collapse state) project to +-inf
        # pixels; the loss must stay finite and the grad NaN-free (zero for
        # the runaway pixels, nonzero for the sane ones).
        h = w = 8
        pts = jnp.full((1, h, w, 3), 2.0).at[0, 0, 0].set(
            jnp.asarray([2.5e31, 1e20, 1e-7])
        )
        loss, g = jax.value_and_grad(self._loss)(pts)
        assert bool(jnp.isfinite(loss))
        assert bool(jnp.isfinite(g).all()), "runaway point poisoned the grad"
        assert float(jnp.abs(g[0, 1:]).max()) > 0, "sane pixels lost signal"

    def test_exact_zero_error_grad_finite(self):
        # A pixel landing EXACTLY on its grid target used to hit
        # d(sqrt)/dx at 0 = NaN.
        h = w = 4
        xs = (jnp.arange(w) + 0.5) / w
        ys = (jnp.arange(h) + 0.5) / h
        gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
        z = 2.0
        # Unit-focal K with principal point 0.5: pixel (i+0.5)/w maps back
        # to world x = (u - 0.5) * z.
        pts = jnp.stack(
            [(gx - 0.5) * z, (gy - 0.5) * z, jnp.full_like(gx, z)], axis=-1
        )[None]
        loss, g = jax.value_and_grad(self._loss)(pts)
        assert bool(jnp.isfinite(loss))
        assert bool(jnp.isfinite(g).all())


class TestPts3dCap:
    def test_identity_below_cap(self):
        raw = jax.random.normal(jax.random.PRNGKey(0), (64, 3))
        raw = raw / jnp.linalg.norm(raw, axis=-1, keepdims=True)
        raw = raw * jnp.linspace(0.05, D_CAP - 0.05, 64)[:, None]
        out = pts3d_postprocess(raw)
        d = jnp.linalg.norm(raw, axis=-1)
        expect = raw / d[:, None] * jnp.expm1(d)[:, None]
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expect), rtol=1e-5, atol=1e-6
        )

    def test_bounded_above_cap(self):
        raw = jnp.asarray([[72.0, 0.0, 0.0], [1e6, 0.0, 0.0]])
        out = pts3d_postprocess(raw)
        assert bool(jnp.isfinite(out).all())
        assert float(jnp.abs(out).max()) < 1e6  # vs expm1(1e6) = inf
        # Monotone: further raw -> further point (a pull-back signal exists)
        assert float(out[1, 0]) > float(out[0, 0])

    def test_grads_finite_at_origin_and_huge(self):
        def f(raw):
            return jnp.sum(pts3d_postprocess(raw))

        g0 = jax.grad(f)(jnp.zeros((4, 3)))
        gbig = jax.grad(f)(jnp.full((4, 3), 1e8))
        assert bool(jnp.isfinite(g0).all())
        assert bool(jnp.isfinite(gbig).all())
        assert float(jnp.abs(gbig).max()) > 0


class TestPts3dHeadInit:
    def test_from_scratch_points_start_in_frustum(self):
        from spfsplatv2_tpu.models.heads.dpt import DPTHead

        head = DPTHead(out_channels=3, feature_dim=32, last_dim=16,
                       layer_dims=(8, 16, 24, 32), out_bias=(0.0, 0.0, 1.2))
        gh = gw = 4
        tokens = [
            0.5 * jax.random.normal(jax.random.PRNGKey(i), (2, gh * gw, d))
            for i, d in enumerate((48, 32, 32, 32))
        ]
        params = head.init(jax.random.PRNGKey(9), tokens, (gh, gw))
        raw = head.apply(params, tokens, (gh, gw))
        pts = pts3d_postprocess(raw)
        z = pts[..., 2]
        # All points in front of the camera at a renderable depth.
        assert float(z.min()) > 0.5 and float(z.max()) < 20.0, (
            float(z.min()), float(z.max()))
