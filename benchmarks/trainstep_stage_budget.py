"""Stage budget for the healthy b=16 flagship train step (round 5).

VERDICT r4 weak #2: the recorded 1636.8 ms/step (MFU 2.8%) has no
accounting.  This probe times ABLATED variants of the same b=16 step
(8x2 accumulation, donated state, AOT-executed) so stage costs fall out
as differences:

  full          — the recorded configuration (MSE+LPIPS+reproj)
  no_lpips      — LPIPS term off (isolates the f32 VGG fwd+bwd)
  no_render     — losses replaced by a direct penalty on the gaussian
                  parameters + poses (removes rasterizer fwd+bwd +
                  image losses; keeps encoder+heads fwd+bwd)
  enc_fwd_bwd   — gradient of a feature-sum through the encoder only
                  (no heads-to-loss path, no renderer)
  enc_fwd       — encoder forward only, no gradients
  opt_only      — optimizer update applied to zero gradients (AdamW +
                  NaN-guard cost at 608M params)

Each variant runs `iters` steps through its own AOT executable; state is
donated.  Run SERIALLY on the chip:

  timeout 3600 env PYTHONPATH=/root/repo:/root/.axon_site \
      python -u benchmarks/trainstep_stage_budget.py
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
import optax  # noqa: E402


def build(batch_size=16, h=256, w=256, microbatch=2):
    from benchmarks.train_bench import run as _  # noqa: F401 (cache layout)
    from spfsplatv2_tpu.models.encoder import (
        SPFSplatV2Config,
        SPFSplatV2Encoder,
    )
    from spfsplatv2_tpu.training.optim import OptimizerConfig, make_optimizer

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

    init_ctx = None
    if jax.default_backend() == "tpu":
        plats = jax.config.jax_platforms or "tpu"
        if "cpu" not in plats.split(","):
            jax.config.update("jax_platforms", f"{plats},cpu")
        init_ctx = jax.default_device(jax.devices("cpu")[0])

    t0 = time.perf_counter()
    with init_ctx if init_ctx else jax.default_device(jax.devices()[0]):
        params = encoder.init(
            jax.random.PRNGKey(2),
            batch["context"]["image"][:1], batch["context"]["intrinsics"][:1],
            batch["target"]["image"][:1], batch["target"]["intrinsics"][:1],
        )
        from spfsplatv2_tpu.losses.lpips import init_lpips_params

        lpips_params = init_lpips_params()
    # Keep params HOST-side; each variant device_puts a fresh copy —
    # donated executions consume the device buffers, and a later variant
    # reusing them dies with INVALID_ARGUMENT (deleted buffer).
    params_host = jax.tree.map(lambda x: __import__("numpy").asarray(x),
                               params)
    lpips_params = jax.device_put(lpips_params, jax.devices()[0])
    jax.block_until_ready(lpips_params)
    print(f"# init {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    optimizer = make_optimizer(OptimizerConfig(), params)
    return encoder, optimizer, params_host, lpips_params, batch, microbatch


def timed_aot(fn, args, iters, label, donate0=True):
    t0 = time.perf_counter()
    jitted = jax.jit(fn, donate_argnums=(0,) if donate0 else ())
    compiled = jitted.lower(*args).compile()
    print(f"# {label} compile {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    out = compiled(*args)
    state = out[0] if isinstance(out, tuple) else None
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        args = (state if state is not None else args[0],) + args[1:]
        out = compiled(*args)
        state = out[0] if isinstance(out, tuple) else None
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return dt, flops


def main():
    iters = int(os.environ.get("STAGE_ITERS", "5"))
    only = set(
        v for v in os.environ.get("STAGE_VARIANTS", "").split(",") if v
    )

    def want(name):
        return not only or name in only
    from spfsplatv2_tpu.models.decoder import DecoderConfig
    from spfsplatv2_tpu.training.step import (
        LossConfig,
        TrainState,
        make_train_step,
    )

    encoder, optimizer, params_host, lpips_params, batch, microbatch = build()
    out = {}

    def fresh_params():
        p = jax.device_put(params_host, jax.devices()[0])
        jax.block_until_ready(p)
        return p

    def fresh_state():
        params = fresh_params()
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=jax.jit(optimizer.init)(params),
        )

    # --- full + no_lpips via the production step ------------------------
    for label, use_lpips in (("full", True), ("no_lpips", False)):
        if not want(label):
            continue
        step_fn = make_train_step(
            encoder, optimizer, (256, 256), DecoderConfig(),
            LossConfig(use_lpips=use_lpips),
            lpips_params=lpips_params if use_lpips else None,
            donate=True, microbatch=microbatch,
        )
        state = fresh_state()
        t0 = time.perf_counter()
        compiled = step_fn.lower(state, batch).compile()
        print(f"# {label} compile {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        lp = lpips_params if use_lpips else None
        state, m = compiled(state, batch, lp, None)
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = compiled(state, batch, lp, None)
        jax.block_until_ready(m)
        out[f"{label}_ms"] = round((time.perf_counter() - t0) / iters * 1e3, 1)
        print(json.dumps(out), flush=True)

    # --- no_render: penalty on gaussians+poses, keeps encoder+heads -----
    def no_render_loss(params, mb):
        enc_out = encoder.apply(
            params, mb["context"]["image"], mb["context"]["intrinsics"],
            mb["target"]["image"], mb["target"]["intrinsics"],
        )
        g = enc_out["gaussians"]
        loss = jnp.mean(g.means ** 2) + jnp.mean(g.harmonics ** 2)
        if enc_out["extrinsics_cwt"] is not None:
            loss = loss + jnp.mean(enc_out["extrinsics_cwt"] ** 2)
        return loss

    def no_render_step(state, batch):
        b = batch["context"]["image"].shape[0]
        mbs = jax.tree.map(
            lambda x: x.reshape((b // microbatch, microbatch) + x.shape[1:])
            if hasattr(x, "shape") and x.shape[:1] == (b,) else x, batch,
        )

        def body(acc, mb):
            loss, grads = jax.value_and_grad(no_render_loss)(state.params, mb)
            return jax.tree.map(jnp.add, acc, grads), loss

        zero = jax.tree.map(jnp.zeros_like, state.params)
        grads, losses = jax.lax.scan(
            body, zero, mbs, length=b // microbatch
        )
        grads = jax.tree.map(lambda x: x / (b // microbatch), grads)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (TrainState(step=state.step + 1, params=new_params,
                           opt_state=opt_state),
                jnp.mean(losses))

    if want("no_render"):
        state = fresh_state()
        dt, fl = timed_aot(no_render_step, (state, batch), iters,
                           "no_render")
        out["no_render_ms"] = round(dt * 1e3, 1)
        print(json.dumps(out), flush=True)

    # --- encoder fwd+bwd only (feature-sum gradient, same accumulation) -
    def enc_loss(params, mb):
        enc_out = encoder.apply(
            params, mb["context"]["image"], mb["context"]["intrinsics"],
            mb["target"]["image"], mb["target"]["intrinsics"],
        )
        return jnp.sum(jnp.abs(enc_out["gaussians"].means)) * 1e-9

    def enc_fwd_bwd(params, batch):
        b = batch["context"]["image"].shape[0]
        mbs = jax.tree.map(
            lambda x: x.reshape((b // microbatch, microbatch) + x.shape[1:])
            if hasattr(x, "shape") and x.shape[:1] == (b,) else x, batch,
        )

        def body(acc, mb):
            g = jax.grad(enc_loss)(params, mb)
            return jax.tree.map(jnp.add, acc, g), None

        zero = jax.tree.map(jnp.zeros_like, params)
        grads, _ = jax.lax.scan(body, zero, mbs, length=b // microbatch)
        return grads

    if want("enc_fwd_bwd"):
        dt, fl = timed_aot(
            lambda p, b: jax.tree.leaves(enc_fwd_bwd(p, b))[0].sum(),
            (fresh_params(), batch), iters, "enc_fwd_bwd", donate0=False,
        )
        out["enc_fwd_bwd_ms"] = round(dt * 1e3, 1)
        print(json.dumps(out), flush=True)

    # --- encoder fwd only ----------------------------------------------
    def enc_fwd(params, batch):
        b = batch["context"]["image"].shape[0]
        mbs = jax.tree.map(
            lambda x: x.reshape((b // microbatch, microbatch) + x.shape[1:])
            if hasattr(x, "shape") and x.shape[:1] == (b,) else x, batch,
        )

        def body(acc, mb):
            return acc + enc_loss(params, mb), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros(()), mbs, length=b // microbatch
        )
        return acc

    if want("enc_fwd"):
        dt, fl = timed_aot(enc_fwd, (fresh_params(), batch), iters, "enc_fwd",
                           donate0=False)
        out["enc_fwd_ms"] = round(dt * 1e3, 1)
        print(json.dumps(out), flush=True)

    # --- optimizer only -------------------------------------------------
    def opt_only(state):
        zero = jax.tree.map(jnp.zeros_like, state.params)
        updates, opt_state = optimizer.update(zero, state.opt_state,
                                              state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=opt_state)

    if want("opt_only"):
        state = fresh_state()
        dt, fl = timed_aot(lambda s: (opt_only(s),), (state,), iters,
                           "opt_only")
        out["opt_only_ms"] = round(dt * 1e3, 1)
    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
