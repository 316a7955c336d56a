"""Row-gather vs lane-gather vs transpose costs at the backward-accum
shapes (round 5): decides the segscan wiring layout.

Run: timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site \
      python -u benchmarks/r5_gather_layout_probe.py
"""

from __future__ import annotations

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

E = 262400
G = 131072
R = 16
ITERS = 20


def scanned(body, *args):
    @jax.jit
    def run(seed, *a):
        def step(acc, key):
            d = jax.random.normal(key, (8,))
            return acc + body(d, *a), None

        acc, _ = jax.lax.scan(step, jnp.zeros(()),
                              jax.random.split(seed, ITERS))
        return acc

    def timed(seed):
        t0 = time.perf_counter()
        jax.block_until_ready(run(jax.random.PRNGKey(seed), *args))
        return (time.perf_counter() - t0) / ITERS

    timed(0)
    return min(timed(1), timed(2))


def main():
    key = jax.random.PRNGKey(0)
    rows = jax.random.normal(key, (E, R))
    lanes = jax.random.normal(key, (R, E))
    perm = jax.random.permutation(jax.random.PRNGKey(1),
                                  jnp.arange(E, dtype=jnp.int32))
    take_g = jnp.sort(jax.random.randint(jax.random.PRNGKey(2), (G,), 0, E)
                      ).astype(jnp.int32)
    out = {}

    def row_gather(d, rows, perm):
        return jnp.sum((rows + d[0])[perm] * rows)

    out["row_gather_262k_ms"] = round(scanned(row_gather, rows, perm) * 1e3, 3)
    print(json.dumps(out), flush=True)

    def lane_gather(d, lanes, perm):
        return jnp.sum(jnp.take(lanes + d[0], perm, axis=1) * lanes)

    out["lane_gather_262k_ms"] = round(
        scanned(lane_gather, lanes, perm) * 1e3, 3)
    print(json.dumps(out), flush=True)

    def transpose_rt(d, lanes):
        t = (lanes + d[0]).T            # (E, R) materialized
        return jnp.sum(t[::7, 0]) + jnp.sum(t[3, :])

    out["transpose_16xE_ms"] = round(scanned(transpose_rt, lanes) * 1e3, 3)
    print(json.dumps(out), flush=True)

    def row_gather_g(d, rows):
        return jnp.sum((rows + d[0])[take_g] * 1.5)

    out["row_gather_131k_sorted_ms"] = round(
        scanned(row_gather_g, rows) * 1e3, 3)
    print(json.dumps(out), flush=True)

    def lane_gather_g(d, lanes):
        return jnp.sum(jnp.take(lanes + d[0], take_g, axis=1) * 1.5)

    out["lane_gather_131k_sorted_ms"] = round(
        scanned(lane_gather_g, lanes) * 1e3, 3)
    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
