"""Dissect the XLA glue around the pallas kernels: where do 6.1 ms binning,
6.9 ms align+gather and ~12 ms of backward glue actually go?

Times each sub-operation as its own jit on bench-shaped data (131k gaussians,
256^2, dup=16, max_per_tile=2048).  Run on the real chip:
  timeout 1400 env PYTHONPATH=/root/repo:/root/.axon_site \
    python -u benchmarks/glue_dissect.py > /tmp/glue.log 2>&1
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

G = 131072
DUP = 16
N_TILES = 256
MPT = 2048
E_CAP = N_TILES * MPT          # 524288 fixed-stride slots
E_LIVE = 262144                # static live-prefix budget (2 * G)
FEAT = 16
ROW_BITS = 17


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def run(name, fn, *args):
    try:
        j = jax.jit(fn)
        ms = timeit(j, *args)
        print(f"{name:34s}: {ms:8.3f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:34s}: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)

    depth = jax.random.uniform(ks[0], (G,), minval=0.5, maxval=8.0)
    packed = jax.random.normal(ks[1], (G, FEAT), jnp.float32)
    # Synthetic duplicate keys: ~211k live entries like the bench scene.
    live = jax.random.uniform(ks[2], (G, DUP)) < (211204 / (G * DUP))
    tile = jax.random.randint(ks[3], (G, DUP), 0, N_TILES, jnp.int32)
    tile = jnp.where(live, tile, N_TILES)
    row = jnp.broadcast_to(jnp.arange(G, dtype=jnp.int32)[:, None], tile.shape)
    key32 = tile * jnp.int32(1 << ROW_BITS) + row

    ids_cap = jax.random.randint(ks[4], (E_CAP,), 0, G, jnp.int32)
    ids_live = jax.random.randint(ks[5], (E_LIVE,), 0, G, jnp.int32)
    dattrs_cap = jax.random.normal(ks[6], (E_CAP, FEAT), jnp.float32)
    dattrs_cap_t = jnp.asarray(dattrs_cap.T)
    dattrs_live = dattrs_cap[:E_LIVE]
    inv = jax.random.randint(ks[7], (G, DUP), 0, E_LIVE, jnp.int32)

    # ---- binning pieces
    run("argsort depth (131k)", lambda d: jnp.argsort(d, stable=False), depth)
    run("sort 2M single 26-bit key",
        lambda k: jax.lax.sort(k.reshape(-1), is_stable=False), key32)
    run("sort 2M tile key + row payload",
        lambda t, r: jax.lax.sort((t.reshape(-1), r.reshape(-1)),
                                  num_keys=1, is_stable=False), tile, row)
    key_sorted = jax.jit(lambda k: jax.lax.sort(k.reshape(-1),
                                                is_stable=False))(key32)
    run("searchsorted 257 bounds",
        lambda s: jnp.searchsorted(
            s, jnp.arange(N_TILES + 1, dtype=jnp.int32) * (1 << ROW_BITS)),
        key_sorted)
    run("mask ids from sorted key",
        lambda s: jnp.bitwise_and(s, jnp.int32((1 << ROW_BITS) - 1)),
        key_sorted)

    # Compact-first alternative: exclusive-scan positions + unique scatter.
    def compact(tile, row):
        liv = (tile < N_TILES).reshape(-1)
        pos = jnp.cumsum(liv.astype(jnp.int32)) - 1
        pos = jnp.where(liv, pos, E_LIVE)
        k = (tile.reshape(-1) * jnp.int32(1 << ROW_BITS) + row.reshape(-1))
        out = jnp.full((E_LIVE + 1,), jnp.int32(N_TILES << ROW_BITS))
        out = out.at[pos].set(k, mode="drop", unique_indices=True)
        return jax.lax.sort(out[:E_LIVE], is_stable=False)
    run("compact(2M->262k) + sort 262k", compact, tile, row)

    # ---- align+gather pieces (fixed-stride E_CAP layout)
    run("row gather packed[ids] E_CAP", lambda p, i: p[i], packed, ids_cap)
    run("row gather + .T E_CAP", lambda p, i: p[i].T, packed, ids_cap)
    run("pre-T table, lane gather E_CAP",
        lambda p, i: p.T[:, i], packed, ids_cap)
    run("row gather E_LIVE (no align)", lambda p, i: p[i], packed, ids_live)
    run("row gather + .T E_LIVE", lambda p, i: p[i].T, packed, ids_live)
    run("transpose alone (E_CAP,16)->T", lambda d: d.T, dattrs_cap)

    # ---- backward reduction alternatives
    run("scatter-add E_CAP rows -> G",
        lambda d, i: jnp.zeros((G, FEAT), jnp.float32).at[i].add(d),
        dattrs_cap, ids_cap)
    run("scatter-add E_LIVE rows -> G",
        lambda d, i: jnp.zeros((G, FEAT), jnp.float32).at[i].add(d),
        dattrs_live, ids_live)
    run("scatter-add E_CAP from (16,E).T",
        lambda d, i: jnp.zeros((G, FEAT), jnp.float32).at[i].add(d.T),
        dattrs_cap_t, ids_cap)
    run("inv-gather (G,16dup) + sum",
        lambda d, iv: jnp.concatenate(
            [d, jnp.zeros((1, FEAT), jnp.float32)])[iv].sum(axis=1),
        dattrs_live, inv)

    # ---- duplicate-expansion elementwise block (tile ids from bboxes)
    x0 = jax.random.randint(ks[8], (G,), 0, 16, jnp.int32)
    y0 = jax.random.randint(ks[9], (G,), 0, 16, jnp.int32)
    bw = jnp.minimum(jax.random.randint(ks[8], (G,), 1, 4, jnp.int32), 16 - x0)

    def expand(x0, y0, bw):
        d = jnp.arange(DUP, dtype=jnp.int32)[None, :]
        bws = jnp.maximum(bw, 1)[:, None]
        dy = d // bws
        dx = d % bws
        return (y0[:, None] + dy) * 16 + (x0[:, None] + dx)
    run("dup expansion elementwise", expand, x0, y0, bw)


if __name__ == "__main__":
    main()
