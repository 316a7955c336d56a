"""Trusted-timing micro-probe: backward-accumulation alternatives.

The prefix backward's accumulation (scatter-SET of e_pad~262k rows x 10
fields into the (g*dup=2M, 10) flat space + dense sums) measures 32 ms
per camera under device-side scan timing — 3.5x the old queued-dispatch
cost model's prediction.  Candidates to replace it:

  A. current: scatter-set 262k -> (2M, 10), two reshape-sums
  B. scatter-set into the TWO-TIER COMPACT space (720k rows) instead
  C. gather-from-sorted: precompute (in binning) the sorted position of
     every two-tier slot; backward = 720k-index GATHER + dense sums
  D. index-count scaling: gather at 262k for reference
  E. the extra binning sort C needs: 720k (key, payload) unstable sort
  F. width sensitivity: scatter-set 262k -> (2M, 4)

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
       python -u benchmarks/scatter_alternatives_probe.py
"""

from __future__ import annotations

import json
import os
import time

import jax

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".xla_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp  # noqa: E402

ITERS = 10
G = 131072
DUP = 16
DUP_A = 4
POOL = G // 8
TWOTIER = G * DUP_A + POOL * (DUP - DUP_A)   # 720896
E_PAD = 262400


def scanned(body, *fixed):
    @jax.jit
    def run(seed, *args):
        def step(acc, kk):
            return acc + body(kk, *args), None

        acc, _ = jax.lax.scan(
            step, jnp.zeros((), jnp.float32), jax.random.split(seed, ITERS)
        )
        return acc

    return lambda seed: run(jax.random.PRNGKey(seed), *fixed)


def main():
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 6)
    # Unique scatter targets for the live prefix: a permutation sample of
    # the 2M flat space (matches the real layout's uniqueness).
    flat_2m = jax.random.permutation(ks[0], G * DUP)[:E_PAD]
    flat_tt = jax.random.permutation(ks[1], TWOTIER)[:E_PAD]
    # Sorted positions per two-tier slot (option C's gather indices).
    pos_tt = jax.random.randint(ks[2], (TWOTIER,), 0, E_PAD)
    sort_keys = jax.random.randint(ks[3], (TWOTIER,), 0, 1 << 30)
    sort_payload = jnp.arange(TWOTIER, dtype=jnp.int32)

    def drows_of(kk, width=10):
        return jax.random.normal(kk, (E_PAD, width)) * 1e-3

    def a_current(kk):
        drows = drows_of(kk)
        dflat = jnp.zeros((G * DUP, 10), jnp.float32)
        dflat = dflat.at[flat_2m].set(drows, unique_indices=True, mode="drop")
        split = G * DUP_A
        return (
            jnp.sum(dflat[:split].reshape(G, DUP_A, 10).sum(1))
            + jnp.sum(dflat[split:].reshape(-1, DUP - DUP_A, 10).sum(1))
        )

    def b_twotier_scatter(kk):
        drows = drows_of(kk)
        dflat = jnp.zeros((TWOTIER, 10), jnp.float32)
        dflat = dflat.at[flat_tt].set(drows, unique_indices=True, mode="drop")
        split = G * DUP_A
        return (
            jnp.sum(dflat[:split].reshape(G, DUP_A, 10).sum(1))
            + jnp.sum(dflat[split:].reshape(POOL, DUP - DUP_A, 10).sum(1))
        )

    def c_gather_sorted(kk):
        drows = drows_of(kk)
        # dead slots must read zero: append a zero row, dead pos -> E_PAD.
        drows_z = jnp.concatenate([drows, jnp.zeros((1, 10))], axis=0)
        dflat = drows_z[pos_tt]                        # (TWOTIER, 10) gather
        split = G * DUP_A
        return (
            jnp.sum(dflat[:split].reshape(G, DUP_A, 10).sum(1))
            + jnp.sum(dflat[split:].reshape(POOL, DUP - DUP_A, 10).sum(1))
        )

    def d_gather_262k(kk):
        drows = drows_of(kk)
        idx = flat_tt % E_PAD
        return jnp.sum(drows[idx[:E_PAD]])

    def e_sort_720k(kk):
        keys = sort_keys ^ jax.random.randint(kk, (), 0, 1 << 20)
        ksorted, psorted = jax.lax.sort(
            (keys, sort_payload), dimension=0, num_keys=1, is_stable=False
        )
        return (ksorted[0] + psorted[-1]).astype(jnp.float32)

    def f_width4(kk):
        drows = drows_of(kk, width=4)
        dflat = jnp.zeros((G * DUP, 4), jnp.float32)
        dflat = dflat.at[flat_2m].set(drows, unique_indices=True, mode="drop")
        return jnp.sum(dflat.reshape(G, DUP, 4).sum(1))

    def g_scatter_add(kk):
        drows = drows_of(kk)
        dflat = jnp.zeros((G * DUP, 10), jnp.float32)
        dflat = dflat.at[flat_2m].add(drows, mode="drop")
        return jnp.sum(dflat.reshape(G, DUP, 10).sum(1))

    def h_segment_sum_sorted(kk):
        # drows sorted by gaussian id would allow a segment-sum; approximate
        # with segment ids = sorted random (monotone) to test the lowering.
        drows = drows_of(kk)
        seg = jnp.sort(jax.random.randint(ks[4], (E_PAD,), 0, G))
        out = jax.ops.segment_sum(drows, seg, num_segments=G,
                                  indices_are_sorted=True)
        return jnp.sum(out)

    # Cheap compiles first so one pathological server-side compile can't
    # starve the whole probe (observed: a single variant compiling 40+ min
    # while others take seconds).
    variants = {
        "E_sort_720k_kp": scanned(e_sort_720k),
        "D_gather_262k_w10": scanned(d_gather_262k),
        "C_gather_720k_w10": scanned(c_gather_sorted),
        "B_scatter_set_720k_w10": scanned(b_twotier_scatter),
        "H_segsum_sorted_262k": scanned(h_segment_sum_sorted),
        "F_scatter_set_2M_w4": scanned(f_width4),
        "G_scatter_add_2M_w10": scanned(g_scatter_add),
        "A_scatter_set_2M_w10": scanned(a_current),
    }
    print("# setup done", flush=True)
    results = {}
    for name, fn in variants.items():
        try:
            t0 = time.perf_counter()
            jax.block_until_ready(fn(0))
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for s in (1, 2):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(s))
                best = min(best, (time.perf_counter() - t0) / ITERS)
            results[name] = {"ms": round(best * 1e3, 2),
                             "compile_s": round(compile_s, 1)}
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": f"{type(e).__name__}: {e}"[:160]}
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
