"""Flagship train-step benchmark at the reference training configuration.

Reference config (config/experiment/spfsplatv2/re10k.yaml): batch 16,
2 context views, 1 target view, 256x256, MASt3R ViT-L backbone — the
full SPFSplatV2 model (~608M params), losses MSE + LPIPS + reproj, 2-group
AdamW. Reports ms/step, steps/s, and an MFU estimate from XLA's own
cost analysis against the v5e peak (197 TFLOP/s bf16).

Run: timeout 2400 python -u benchmarks/train_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

# Persistent compilation cache (shared with bench.py): the builder session
# seeds it so the driver's run compiles from cache instead of dying in
# remote_compile (the round-2/3 failure mode).
_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".xla_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp  # noqa: E402

V5E_PEAK_FLOPS = 197e12


def run(batch_size: int = 16, h: int = 256, w: int = 256,
        use_lpips: bool = True, iters: int = 10,
        microbatch: int = 2) -> dict:
    # microbatch=4 LOOKS like it fits (the compile succeeds) but XLA's
    # memory_analysis puts peak HBM at 17.9 GB on the 16 GB chip; the axon
    # runtime silently pages buffers over the tunnel instead of OOMing,
    # which measured 82 s/step at 0.1% MFU.  microbatch=2 trades 2x scan
    # iterations for ~5 GB of activation temps and stays resident.
    from spfsplatv2_tpu.models.decoder import DecoderConfig
    from spfsplatv2_tpu.models.encoder import (
        SPFSplatV2Config,
        SPFSplatV2Encoder,
    )
    from spfsplatv2_tpu.training.optim import OptimizerConfig, make_optimizer
    from spfsplatv2_tpu.training.step import (
        LossConfig,
        make_train_step,
    )

    b, v_cxt, v_tgt = batch_size, 2, 1
    encoder = SPFSplatV2Encoder(SPFSplatV2Config())

    key = jax.random.PRNGKey(0)
    intr = jnp.broadcast_to(
        jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]),
        (b, v_cxt + v_tgt, 3, 3),
    )
    eye = jnp.broadcast_to(jnp.eye(4), (b, v_cxt + v_tgt, 4, 4))

    def views(sl, seed):
        n = sl.stop - sl.start
        return {
            "image": jax.random.uniform(jax.random.PRNGKey(seed),
                                        (b, n, h, w, 3)),
            "intrinsics": intr[:, sl],
            "near": jnp.full((b, n), 1.0),
            "far": jnp.full((b, n), 100.0),
            "extrinsics": eye[:, sl],
        }

    batch = {
        "context": views(slice(0, v_cxt), 1),
        "target": views(slice(v_cxt, v_cxt + v_tgt), 2),
    }

    # Init the 608M params on the HOST CPU and ship them once: eager init
    # over the axon tunnel is one remote call per op (~10+ minutes and a
    # large window for transient tunnel faults — the round-2 bench died
    # here); host init + one 2.4 GB transfer takes ~1-2 min.
    t0 = time.perf_counter()
    init_ctx = None
    if jax.default_backend() == "tpu":
        try:
            plats = jax.config.jax_platforms or "tpu"
            if "cpu" not in plats.split(","):
                jax.config.update("jax_platforms", f"{plats},cpu")
            init_ctx = jax.default_device(jax.devices("cpu")[0])
        except Exception:  # noqa: BLE001 - fall back to on-device init
            init_ctx = None

    def do_init():
        return encoder.init(
            jax.random.PRNGKey(2),
            batch["context"]["image"][:1], batch["context"]["intrinsics"][:1],
            batch["target"]["image"][:1], batch["target"]["intrinsics"][:1],
        )

    if init_ctx is not None:
        with init_ctx:
            params = do_init()
        params = jax.device_put(params, jax.devices()[0])
    else:
        params = do_init()
    jax.block_until_ready(params)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"init: {time.perf_counter()-t0:.1f}s, {n_params/1e6:.0f}M params",
          file=sys.stderr, flush=True)

    lpips_params = None
    if use_lpips:
        from spfsplatv2_tpu.losses.lpips import init_lpips_params

        if init_ctx is not None:
            with init_ctx:
                lpips_params = init_lpips_params()
            lpips_params = jax.device_put(lpips_params, jax.devices()[0])
        else:
            lpips_params = init_lpips_params()

    optimizer = make_optimizer(OptimizerConfig(), params)
    # b=16 activations don't fit one 16 GB v5e chip (the reference trains
    # this recipe on 80 GB A100s); 8x2 gradient accumulation (microbatch=2)
    # is numerically the same step.  steps/s and MFU are for the FULL b=16
    # step.
    step_fn = make_train_step(
        encoder, optimizer, (h, w), DecoderConfig(),
        LossConfig(use_lpips=use_lpips), lpips_params=lpips_params,
        donate=True, microbatch=microbatch,
    )
    # jit the optimizer-state init: eager optax.init at 608M is hundreds
    # of per-op remote calls over the tunnel.
    from spfsplatv2_tpu.training.step import TrainState

    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=jax.jit(optimizer.init)(params),
    )

    t0 = time.perf_counter()
    lowered = step_fn.lower(state, batch)
    compiled = lowered.compile()
    print(f"compile: {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    ma = compiled.memory_analysis()
    if isinstance(ma, list):
        ma = ma[0] if ma else None
    try:
        peak_gb = (
            ma.argument_size_in_bytes + ma.output_size_in_bytes
            - ma.alias_size_in_bytes + ma.temp_size_in_bytes
        ) / 2**30
    except AttributeError:
        peak_gb = None
    # Execute the AOT executable DIRECTLY: re-tracing through the jit
    # wrapper was observed to produce a different persistent-cache key
    # than lowered.compile() (two ~170 MB step_fn entries per run), i.e.
    # a silent second 400 s compile.  The AOT object reuses this one.
    # Its call signature is the lowered one: (state, batch, lpips, dist).
    state, metrics = compiled(state, batch, lpips_params, None)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = compiled(state, batch, lpips_params, None)
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / iters
    mfu = flops / dt / V5E_PEAK_FLOPS if flops else None
    out = {
        "train_step_ms_b16": round(dt * 1e3, 1),
        "train_steps_per_s_b16": round(1.0 / dt, 3),
        "train_mfu_pct": round(100 * mfu, 1) if mfu else None,
        "train_flops_per_step": flops,
        "train_peak_hbm_gb": round(peak_gb, 2) if peak_gb is not None else None,
        "params_m": round(n_params / 1e6),
        "train_microbatch": microbatch,
    }
    return out


if __name__ == "__main__":
    print(json.dumps(run()), flush=True)
