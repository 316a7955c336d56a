"""Binning sort variants at the bench scale (2M duplicate entries).

The e2e profile shows the stable (tile_key + gid payload) sort as a
3-STREAM HLO sort (s32 x3, ~3.2 ms/call): XLA materializes stable sorts on
TPU with a hidden iota tiebreaker stream, and key + 2 payloads falls off
the fast radix-ish path (memory: 0.12 ms vs 9.6 ms at 2M).  Since
gaussians are depth-permuted BEFORE slot generation, the duplicate-slot
row index g IS the depth rank, so tile and order can be packed into one
26-bit key and sorted UNSTABLY with no payload at all.

  s0: stable   (tile9,  gid)  num_keys=1  (current)
  s1: unstable (tile9,  g17)  num_keys=2
  s2: unstable packed 26-bit single stream
  s3: unstable packed 26-bit + gid payload (skips the later decode gather)

Run: timeout 2400 python -u benchmarks/sort_variants.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

E = 2097152
G = 131072
N_TILES = 257


def chained_ms(op, init, n1=2, n2=8):
    def runner(n):
        @jax.jit
        def run(c):
            return jax.lax.fori_loop(0, n, lambda i, c: op(c), c)

        out = run(init)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(init)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    t1 = runner(n1)
    t2 = runner(n2)
    return (t2 - t1) / (n2 - n1) * 1e3


def main():
    rng = np.random.default_rng(0)
    tile = jnp.asarray(rng.integers(0, N_TILES, E), jnp.int32)
    g = jnp.asarray(
        np.repeat(np.arange(G, dtype=np.int32), E // G), jnp.int32
    )
    gid = jnp.asarray(rng.permutation(G).astype(np.int32)[np.asarray(g) % G])

    def s0(carry):
        t, gg, p = carry
        ts, ps = jax.lax.sort((t, p), dimension=0, num_keys=1, is_stable=True)
        return ((ts + ps % 2) % N_TILES, gg, ps)

    def s1(carry):
        t, gg, p = carry
        ts, gs = jax.lax.sort((t, gg), dimension=0, num_keys=2,
                              is_stable=False)
        return ((ts + gs % 2) % N_TILES, gs, p)

    def s2(carry):
        t, gg, p = carry
        key = t * jnp.int32(1 << 17) + gg
        ks = jax.lax.sort(key, dimension=0, is_stable=False)
        return ((ks % N_TILES), (ks + 1) % G, p)

    def s3(carry):
        t, gg, p = carry
        key = t * jnp.int32(1 << 17) + gg
        ks, ps = jax.lax.sort((key, p), dimension=0, num_keys=1,
                              is_stable=False)
        return ((ks % N_TILES), gg, ps)

    for name, fn in [("s0_stable_payload", s0), ("s1_2key_unstable", s1),
                     ("s2_packed26_nopayload", s2),
                     ("s3_packed26_payload", s3)]:
        ms = chained_ms(fn, (tile, g, gid))
        print(f"{name:24s} {ms:7.3f} ms/iter", flush=True)

    # decode gather cost (s2 needs ids = order[g_sorted] OR a permuted
    # packed table): 131k-row gather of (131072, 16) f32 by ~sorted ids.
    table = jnp.asarray(rng.normal(size=(G, 16)), np.float32)
    perm = jnp.asarray(rng.permutation(G).astype(np.int32))

    def d0(carry):
        tab, p = carry
        out = tab[p]
        return (tab + out * 1e-12, (p + 1) % G)

    ms = chained_ms(d0, (table, perm), n1=4, n2=12)
    print(f"{'permute_table_131k':24s} {ms:7.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
