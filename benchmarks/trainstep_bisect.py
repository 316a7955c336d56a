"""Bisect the b=16 train-step pathology (82 s/step, 0.1% MFU, round 4).

The healthy datapoint is the round-3 overfit run: b=2, no microbatch
scan, no remat_heads, LPIPS off -> 0.89 s/step.  The recorded b=16 step
(4x4 accumulation, remat heads, LPIPS on) costs 82 s -- 11.5x worse than
linear batch scaling, with only 18.2 TFLOP of matmul work (0.5% of f32
peak), so the time is NOT FLOPs.  This probe times the deltas:

  1. LPIPS-alone fwd+bwd at b=16 (isolates the f32 VGG + remat).
  2. The exact recorded step with use_lpips=False (isolates LPIPS within
     the full program: scan + remat_heads unchanged).

Run: timeout 1800 python -u benchmarks/trainstep_bisect.py
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


def time_lpips(b=16, h=256, w=256, iters=10):
    from spfsplatv2_tpu.losses.lpips import init_lpips_params, lpips_loss

    params = init_lpips_params()
    pred = jax.random.uniform(jax.random.PRNGKey(0), (b, h, w, 3))
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (b, h, w, 3))

    @jax.jit
    def run(params, pred, tgt):
        def step(acc, _):
            g = jax.grad(lambda p: lpips_loss(params, p, tgt))(pred + acc * 0)
            return acc + jnp.sum(jnp.abs(g[0, 0, 0])), None

        acc, _ = jax.lax.scan(step, jnp.zeros(()), None, length=iters)
        return acc

    t0 = time.perf_counter()
    jax.block_until_ready(run(params, pred, tgt))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(run(params, pred, tgt))
    dt = (time.perf_counter() - t0) / iters
    return {"lpips_b16_fwd_bwd_ms": round(dt * 1e3, 1),
            "lpips_compile_s": round(compile_s, 1)}


def main():
    out = time_lpips()
    print(json.dumps(out), flush=True)

    from benchmarks.train_bench import run as train_run

    # microbatch=4 explicitly: this reproduces the RECORDED round-4 paging
    # pathology (17.9 GB peak at 4x4 accumulation) — the train_bench default
    # has since moved to the healthy microbatch=2.
    out2 = train_run(use_lpips=False, iters=5, microbatch=4)
    out2 = {f"nolpips_{k}": v for k, v in out2.items()}
    print(json.dumps(out2), flush=True)


if __name__ == "__main__":
    main()
