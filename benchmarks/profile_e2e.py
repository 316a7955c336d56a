"""Profile the composed e2e fwd+bwd program and print per-op device times.

Uses jax.profiler to capture an xplane trace of the bench workload, then
parses the XSpace protobuf directly (xprof/tensorboard_plugin_profile are
installed) and aggregates device-plane event durations by op name.
"""

import glob
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

TRACE_DIR = "/tmp/jax_e2e_trace"


def build():
    from spfsplatv2_tpu.ops.covariance import build_covariance
    from spfsplatv2_tpu.ops.rasterizer import RasterizerConfig, render

    h = w = 256
    g = 2 * h * w
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 8)
    means = jnp.concatenate(
        [
            jax.random.uniform(keys[0], (g, 2), minval=-1.5, maxval=1.5),
            jax.random.uniform(keys[1], (g, 1), minval=1.0, maxval=6.0),
        ],
        axis=-1,
    )
    scales = 0.002 + 0.01 * jax.random.uniform(keys[2], (g, 3))
    covs = build_covariance(scales, jax.random.normal(keys[3], (g, 4)))
    harmonics = 0.3 * jax.random.normal(keys[4], (g, 3, 25))
    opacities = jax.random.uniform(keys[5], (g,), minval=0.3, maxval=0.9)
    k = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])
    cfg = RasterizerConfig(backend="pallas", scale_invariant=False,
                           max_per_tile=2048, chunk=256,
                           max_tiles_per_gaussian=16)
    near = jnp.ones((1,)); far = jnp.full((1,), 100.0)
    bg = jnp.zeros((1, 3))
    e1 = jnp.eye(4)[None]; k1 = k[None]
    tgt = jax.random.uniform(keys[6], (1, h, w, 3))

    @jax.jit
    def e2e_grad(m, c, h_, o, e):
        def f(m, c, h_, o, e):
            out = render(e, k1, near, far, (h, w), bg, m, c, h_, o, cfg=cfg)
            return jnp.mean((out.color - tgt) ** 2)
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(m, c, h_, o, e)

    return e2e_grad, (means, covs, harmonics, opacities, e1)


def parse_trace():
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    if not files:
        print("NO TRACE FILES FOUND under", TRACE_DIR)
        return
    path = max(files, key=lambda p: len(p))
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        totals = defaultdict(float)
        counts = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                totals[name] += ev.duration_ps / 1e9  # -> ms
                counts[name] += 1
        print(f"== plane: {plane.name} (total {sum(totals.values()):.2f} ms "
              f"over all lines) ==")
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:45]:
            print(f"  {ms:9.3f} ms  x{counts[name]:<4d} {name[:110]}")


def main():
    fn, args = build()
    out = fn(*args)
    jax.block_until_ready(out)
    # timed reference
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"e2e fwd+bwd: {(time.perf_counter()-t0)/10*1e3:.2f} ms/call",
          flush=True)

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            out = fn(*args)
        jax.block_until_ready(out)
    parse_trace()


if __name__ == "__main__":
    main()
