"""Scatter-add cost model probe: per-index vs per-element vs OOB drops.

Feeds the backward-glue design: the gather VJP scatter-adds (e_aligned, F)
entry grads into (g, F).  If OOB indices are dropped cheaply, dead slots
can point out of bounds instead of carrying spread in-bounds indices.

Each timed call gets novel inputs (defeats tunnel caching); two passes
printed per variant — agreement = sanity.

Run: timeout 1400 env PYTHONPATH=/root/repo:/root/.axon_site \
  python -u benchmarks/scatter_cost_probe.py > /tmp/scat.log 2>&1
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

G = 131072
E = 327680
K = 6


def measure(fn, args_list):
    out = fn(*args_list[0])
    jax.block_until_ready(out)

    def one_pass():
        t0 = time.perf_counter()
        outs = [fn(*args_list[i % K]) for i in range(1, K + 1)]
        s = sum(jnp.sum(o[0].astype(jnp.float32)) for o in outs)
        _ = float(s)
        return (time.perf_counter() - t0) / K * 1e3

    return one_pass(), one_pass()


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    datasets = []
    for _ in range(K):
        upd16 = jnp.asarray(rng.normal(size=(E, 16)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, G, E).astype(np.int32))
        # ~35% dead mask like the aligned layout
        live = jnp.asarray((rng.random(E) < 0.65))
        datasets.append((upd16, idx, live))

    def scat(upd, idx):
        return (jnp.zeros((G, upd.shape[1]), jnp.float32).at[idx].add(upd),)

    variants = [
        ("scatter-add 327k x 16", lambda u, i, lv: scat(u, i)),
        ("scatter-add 327k x 10", lambda u, i, lv: scat(u[:, :10], i)),
        ("scatter-add 327k x 4", lambda u, i, lv: scat(u[:, :4], i)),
        ("scatter-add 327k x 1", lambda u, i, lv: scat(u[:, :1], i)),
        ("35% OOB-dropped x 10",
         lambda u, i, lv: scat(u[:, :10], jnp.where(lv, i, G))),
        ("all OOB x 10", lambda u, i, lv: scat(u[:, :10], i + G)),
        ("segment-ids sorted x 10",
         lambda u, i, lv: scat(u[:, :10], jnp.sort(i))),
    ]
    for name, fn in variants:
        try:
            j = jax.jit(fn)
            m1, m2 = measure(j, datasets)
            print(f"{name:26s}: {m1:7.3f} / {m2:7.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:26s}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
