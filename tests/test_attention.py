"""sdpa dispatch: dense path everywhere, flash parity on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spfsplatv2_tpu.ops.attention import _dense, sdpa


def _inputs(n_q=300, n_k=4500, b=2, h=4, d=64, seed=0):
    key = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, n_q, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, n_k, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, n_k, d), jnp.float32)
    return q, k, v


def test_sdpa_matches_dense_below_threshold():
    q, k, v = _inputs(n_q=64, n_k=128)
    out = sdpa(q, k, v, 0.125)
    ref = _dense(q, k, v, 0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="flash kernel path only lowers on TPU",
)
def test_flash_parity_on_tpu():
    q, k, v = _inputs()

    def loss_flash(q, k, v):
        return jnp.sum(sdpa(q, k, v, 0.125, flash_min_kv=1024) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(_dense(q, k, v, 0.125) ** 2)

    of, gf = jax.value_and_grad(loss_flash, argnums=(0,))(q, k, v)
    od, gd = jax.value_and_grad(loss_dense, argnums=(0,))(q, k, v)
    np.testing.assert_allclose(float(of), float(od), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(gf[0]), np.asarray(gd[0]), rtol=2e-3, atol=2e-3
    )


def test_view_masked_chunked_matches_dense():
    from spfsplatv2_tpu.ops.attention import sdpa_view_masked

    key = jax.random.PRNGKey(1)
    b, h, vq, vk, l, d = 1, 2, 4, 4, 16, 32
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, vq * l, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, vk * l, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, vk * l, d), jnp.float32)
    neg = jnp.float32(-1e30)
    view_mask = jnp.where(
        jnp.eye(vq, vk, dtype=bool), neg, 0.0
    )  # diagonal blocked

    dense = sdpa_view_masked(q, k, v, 0.2, view_mask, l,
                             chunked_min_kv=10**9)
    chunked = sdpa_view_masked(q, k, v, 0.2, view_mask, l,
                               chunk_q=16, chunked_min_kv=1)
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(dense), atol=1e-6
    )

    # grads agree too
    gd = jax.grad(lambda q: jnp.sum(sdpa_view_masked(
        q, k, v, 0.2, view_mask, l, chunked_min_kv=10**9) ** 2))(q)
    gc = jax.grad(lambda q: jnp.sum(sdpa_view_masked(
        q, k, v, 0.2, view_mask, l, chunk_q=16, chunked_min_kv=1) ** 2))(q)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gd), atol=1e-5)
