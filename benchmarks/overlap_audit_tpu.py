"""Prove the all-reduce/rasterizer-backward overlap from TPU-scheduled HLO.

The CPU dryrun lowers the gradient psum synchronously, so the overlap
north star (BASELINE.json: "all-reduce overlapped with the rasterizer
backward") is only checkable from a TPU-compiled program, where XLA's
latency-hiding scheduler emits async all-reduce-start/done pairs and the
post-scheduling instruction order is the execution schedule.

This probe AOT-compiles the tiny-shape flagship train step over an
8-device TPU topology (jax.experimental.topologies — no 8-chip hardware
needed, only the compiler) and runs parallel.mesh.audit_overlap on the
optimized HLO.  Result -> artifacts/overlap_audit_tpu.json, asserted by
tests/test_aux.py.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
       python -u benchmarks/overlap_audit_tpu.py
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import jax

_REPO = Path(__file__).resolve().parent.parent
jax.config.update("jax_compilation_cache_dir", str(_REPO / ".xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def build_step(n: int, devices):
    from jax.sharding import Mesh

    from spfsplatv2_tpu.models.croco.backbone import CrocoBackboneConfig
    from spfsplatv2_tpu.models.decoder import DecoderConfig
    from spfsplatv2_tpu.models.encoder import SPFSplatV2Config, SPFSplatV2Encoder
    from spfsplatv2_tpu.ops.rasterizer import RasterizerConfig
    from spfsplatv2_tpu.parallel.mesh import batch_sharding, replicated
    from spfsplatv2_tpu.training.optim import OptimizerConfig, make_optimizer
    from spfsplatv2_tpu.training.step import (
        LossConfig,
        TrainState,
        make_train_step,
    )

    b, v_cxt, v_tgt, h, w = n, 2, 1, 32, 32
    backbone = CrocoBackboneConfig(
        patch_size=16, enc_depth=2, enc_embed_dim=64, enc_num_heads=4,
        dec_depth=4, dec_embed_dim=48, dec_num_heads=4,
        compute_dtype="float32",
    )
    encoder = SPFSplatV2Encoder(SPFSplatV2Config(backbone=backbone, sh_degree=1))
    intr = jnp.broadcast_to(
        jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]),
        (b, v_cxt + v_tgt, 3, 3),
    )
    eye = jnp.broadcast_to(jnp.eye(4), (b, v_cxt + v_tgt, 4, 4))

    def views(sl, seed):
        nn = sl.stop - sl.start
        return {
            "image": jax.random.uniform(jax.random.PRNGKey(seed),
                                        (b, nn, h, w, 3)),
            "intrinsics": intr[:, sl], "near": jnp.full((b, nn), 0.5),
            "far": jnp.full((b, nn), 100.0), "extrinsics": eye[:, sl],
        }

    batch = {"context": views(slice(0, v_cxt), 1),
             "target": views(slice(v_cxt, v_cxt + v_tgt), 2)}
    params = jax.eval_shape(
        lambda: encoder.init(
            jax.random.PRNGKey(2), batch["context"]["image"],
            batch["context"]["intrinsics"], batch["target"]["image"],
            batch["target"]["intrinsics"],
        )
    )
    optimizer = make_optimizer(OptimizerConfig(warm_up_steps=2, max_steps=10),
                               params)
    mesh = Mesh(np.asarray(devices).reshape(n, 1), ("data", "tile"))
    step_fn = make_train_step(
        encoder, optimizer, (h, w),
        DecoderConfig(rasterizer=RasterizerConfig(max_per_tile=256, chunk=128)),
        LossConfig(use_lpips=False), donate=False, mesh=mesh,
    )
    opt_state = jax.eval_shape(optimizer.init, params)
    state = TrainState(
        step=jax.ShapeDtypeStruct((), jnp.int32), params=params,
        opt_state=opt_state,
    )
    rep = replicated(mesh)
    shard = batch_sharding(mesh)
    state_sh = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep), state
    )
    batch_sh = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=shard), batch
    )
    return step_fn, state_sh, batch_sh


def main():
    from spfsplatv2_tpu.parallel.mesh import audit_collectives, audit_overlap

    result = {}
    try:
        from jax.experimental import topologies

        topo = None
        errors = []
        for name in ("v5e:2x4", "v5e:4x2", "v5litepod-8"):
            try:
                topo = topologies.get_topology_desc(
                    platform="tpu", topology_name=name
                )
                result["topology"] = name
                break
            except Exception as e:  # noqa: BLE001
                errors.append(f"{name}: {type(e).__name__}: {e}"[:120])
        if topo is None:
            raise RuntimeError("; ".join(errors))
        devices = topo.devices
        n = len(devices)
        step_fn, state_sh, batch_sh = build_step(n, devices)
        compiled = step_fn.lower(state_sh, batch_sh).compile()
        hlo = compiled.as_text()
        result["n_devices"] = n
        result["collectives"] = audit_collectives(hlo)
        result["overlap"] = audit_overlap(hlo)
    except Exception as e:  # noqa: BLE001
        result["error"] = f"{type(e).__name__}: {e}"[:400]
    out = _REPO / "artifacts" / "overlap_audit_tpu.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(result, indent=1))
    print(json.dumps(result, indent=1), flush=True)


if __name__ == "__main__":
    main()
