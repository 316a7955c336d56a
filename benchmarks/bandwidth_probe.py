"""Measure the chip's EFFECTIVE HBM bandwidth + dedup-proof op costs.

Every timed invocation gets a NOVEL input (host-generated noise), so the
tunnel cannot serve cached results; iterations are dependency-chained
inside one fori_loop so per-iter device cost is real.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def fetch(out):
    """Force REAL completion: block_until_ready on this tunnel backend
    returns before execution finishes, so reduce to a scalar and pull it
    to the host — data cannot materialize without the work happening."""
    leaves = jax.tree.leaves(out)
    return float(jnp.asarray(sum(jnp.sum(x).astype(jnp.float32) for x in leaves)))


def timed_chain(op, make_init, n1=2, n2=8):
    """Per-iteration ms via two chained loop lengths; the host fetch and
    dispatch overheads cancel in the two-point difference."""

    def run_once(n, seed):
        @jax.jit
        def run(c):
            return jax.lax.fori_loop(0, n, lambda i, c: op(c), c)

        fetch(run(make_init(seed)))   # compile + warm
        init2 = make_init(seed + 1000)
        t0 = time.perf_counter()
        fetch(run(init2))
        return time.perf_counter() - t0

    t1 = run_once(n1, 1)
    t2 = run_once(n2, 2)
    return (t2 - t1) / (n2 - n1) * 1e3


def main():
    rng = np.random.default_rng(0)

    # ---- effective streaming bandwidth: 64M f32 = 256MB per direction
    big_shape = (64 * 1024 * 1024,)

    def mk_big(seed):
        return jnp.asarray(
            np.random.default_rng(seed).normal(size=big_shape), np.float32
        )

    def op_copy(c):
        return c * 1.0000001 + 1e-12

    ms = timed_chain(op_copy, mk_big, 2, 8)
    gbps = 2 * 256 / (ms / 1e3) / 1024
    print(f"stream 256MB r+w: {ms:.2f} ms/iter -> {gbps:.0f} GB/s eff",
          flush=True)

    # ---- matmul peak check: 4096^3 bf16
    def mk_mat(seed):
        r = np.random.default_rng(seed)
        return (jnp.asarray(r.normal(size=(4096, 4096)), np.float32)
                .astype(jnp.bfloat16))

    def op_mm(c):
        return jnp.tanh(c @ c)

    ms = timed_chain(op_mm, mk_mat, 2, 8)
    tflops = 2 * 4096**3 / (ms / 1e3) / 1e12
    print(f"matmul 4096^3 bf16: {ms:.2f} ms/iter -> {tflops:.0f} TFLOP/s",
          flush=True)

    # ---- the real row gather, dedup-proof
    g, e_cap = 131072, 524288

    def mk_gather(seed):
        r = np.random.default_rng(seed)
        return (jnp.asarray(r.normal(size=(g, 16)), np.float32),
                jnp.asarray(r.integers(0, g, e_cap), jnp.int32))

    def op_gather(c):
        table, ids = c
        out = table[ids]
        return (table + out[:g] * 1e-12, (ids + 7) % g)

    ms = timed_chain(op_gather, mk_gather, 2, 8)
    print(f"row gather 524k x 16: {ms:.3f} ms/iter", flush=True)

    # ---- duplicate scatter-add, dedup-proof
    def mk_scatter(seed):
        r = np.random.default_rng(seed)
        return (jnp.zeros((g, 16), jnp.float32),
                jnp.asarray(r.normal(size=(e_cap, 16)), np.float32),
                jnp.asarray(r.integers(0, g, e_cap), jnp.int32))

    def op_scatter(c):
        acc, da, ids = c
        out = jnp.zeros((g, 16), jnp.float32).at[ids].add(da)
        return (acc + out * 1e-12, da + 1e-12, (ids + 7) % g)

    ms = timed_chain(op_scatter, mk_scatter, 2, 8)
    print(f"dup scatter-add 524k x 16: {ms:.3f} ms/iter", flush=True)

    # ---- stable 2-stream sort, dedup-proof
    def mk_sort(seed):
        r = np.random.default_rng(seed)
        return (jnp.asarray(r.integers(0, 257, 2097152), jnp.int32),
                jnp.asarray(r.integers(0, g, 2097152), jnp.int32))

    def op_sort(c):
        keys, vals = c
        ks, vs = jax.lax.sort((keys, vals), dimension=0, num_keys=1,
                              is_stable=True)
        return ((ks + vs % 3) % 257, vs)

    ms = timed_chain(op_sort, mk_sort, 2, 6)
    print(f"stable sort 2M + payload: {ms:.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
