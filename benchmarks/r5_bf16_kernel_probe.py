"""Does bf16 speed up the compositing kernels' VPU math on v5e? (round 5)

Measures a stripped-down forward-compositing chunk loop (alpha MXU
contraction + exp + lane prefix-product + weight MXU) at f32 vs bf16
internal dtype, same chunk count as the bench workload (~824 chunks).
Decides whether a bf16 kernel variant is worth building.

Run: timeout 1200 env PYTHONPATH=/root/repo:/root/.axon_site \
      python -u benchmarks/r5_bf16_kernel_probe.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".xla_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

P = 256
CHUNK = 256
FEAT = 16
N_CHUNKS = 824
ITERS = 20


def _prefix_prod_lanes(x, n):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    k = 1
    while k < n:
        shifted = pltpu.roll(x, k, axis=x.ndim - 1)
        x = x * jnp.where(lane >= k, shifted, jnp.ones((), x.dtype))
        k *= 2
    return x


def make_kernel(dtype):
    def kernel(basis_ref, attrs_ref, out_ref):
        basis = basis_ref[...]

        def body(c, carry):
            t_carry, acc = carry
            attrs = attrs_ref[0, :, :]
            qmat = attrs[0:8, :]
            # MXU contractions accumulate in f32 (bf16 accumulation is
            # not supported); only the VPU recurrence math runs in dtype.
            power = jax.lax.dot_general(
                basis, qmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            alpha = jnp.minimum(
                0.99, attrs[8:9, :].astype(jnp.float32) * jnp.exp(power)
            )
            alpha = jnp.where(power <= 0.0, alpha, 0.0).astype(dtype)
            om = (1.0 - alpha).astype(dtype)
            t_incl = t_carry * _prefix_prod_lanes(om, CHUNK)
            t_excl = jnp.concatenate([t_carry, t_incl[:, :-1]], axis=1)
            w = alpha * t_excl
            cd = attrs[5:13, :].astype(dtype)
            contrib = jax.lax.dot_general(
                w, cd, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            t_new = jnp.min(t_incl, axis=1, keepdims=True)
            return t_new, acc + contrib

        t0 = jnp.ones((P, 1), dtype)
        acc0 = jnp.zeros((P, 8), jnp.float32)
        _, acc = jax.lax.fori_loop(0, N_CHUNKS, body, (t0, acc0))
        out_ref[...] = acc

    return kernel


def run(dtype):
    basis = jnp.ones((P, 8), dtype)
    attrs = jax.random.uniform(
        jax.random.PRNGKey(0), (1, FEAT, CHUNK), minval=-0.1, maxval=0.0
    ).astype(dtype)
    # keep basis/attrs in dtype so the alpha MXU contraction runs at the
    # bf16 input rate even with an f32 accumulator

    fn = pl.pallas_call(
        make_kernel(dtype),
        out_shape=jax.ShapeDtypeStruct((P, 8), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def scanned(seed, basis, attrs):
        def step(acc, key):
            a = attrs + jax.random.uniform(key, attrs.shape,
                                           attrs.dtype) * 1e-6
            return acc + jnp.sum(fn(basis, a)), None

        acc, _ = jax.lax.scan(step, jnp.zeros(()),
                              jax.random.split(seed, ITERS))
        return acc

    def timed(seed):
        t0 = time.perf_counter()
        jax.block_until_ready(scanned(jax.random.PRNGKey(seed), basis, attrs))
        return (time.perf_counter() - t0) / ITERS

    timed(0)
    return min(timed(1), timed(2))


def main():
    out = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        out[f"{name}_ms"] = round(run(dtype) * 1e3, 3)
        print(json.dumps(out), flush=True)
    out["speedup"] = round(out["f32_ms"] / out["bf16_ms"], 2)
    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
