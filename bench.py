"""Headline benchmark: rendered Mpix/s fwd+bwd per chip (256^2, 2-view scale).

Measures the differentiable rasterizer forward+backward throughput on the
realistic SPFSplatV2 training workload: per-pixel Gaussians from 2 context
views at 256x256 (2 * 65536 = 131072 Gaussians per scene), photometric loss,
gradients to all Gaussian parameters AND the camera pose. Prints ONE JSON
line with the measured Mpix/s.

`vs_baseline` is the ratio against the reference CUDA rasterizer's
fwd+bwd throughput; the reference repo publishes no numbers (BASELINE.md).
The denominator estimates diff-gaussian-rasterization fwd+bwd on one A100
at this workload (~1-2 ms fwd + ~4 ms bwd per 65k-pixel view of 131k
gaussians => ~25 Mpix/s); recalibrated when a measured reference number
becomes available.

Measurement design (PERFORMANCE.md "trusted regimes", VERDICT r3 weak #1):
  * DEVICE-SIDE timing loop: the N timing iterations run inside ONE jitted
    `lax.scan` over freshly perturbed inputs, with a checksum carried and
    fetched to the host.  One RPC per pass — per-dispatch tunnel latency
    (the round-3 2x driver-vs-serial gap) cannot contaminate the number.
    Perturbed inputs + the checksum fetch defeat the tunnel's
    identical-execution caching.
  * PERSISTENT COMPILATION CACHE at .xla_cache (repo-relative): the builder
    session seeds it; the driver's run compiles from cache in seconds
    instead of dying in remote_compile (the round-2/3 train-bench killer).
  * TOTAL TIME BUDGET: every stage checks the deadline; whatever is
    measured before the driver's timeout is already printed.
  * The emitted JSON echoes the exact RasterizerConfig and a per-stage
    split (binning / fwd / fwd+bwd) so regressions are self-diagnosing.
"""

from __future__ import annotations

import json
import os
import time

import jax

# Must be set before the first compile.  Repo-relative so the driver's
# run (same workspace) hits the cache the builder seeded.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp  # noqa: E402

REFERENCE_MPIX_S_ESTIMATE = 25.0
TRANSIENT_RETRIES = 3
RETRY_SLEEP_S = 20.0
# Global wall-clock budget (s).  The driver's harness kills the bench at
# its own timeout; budget low enough that the train bench is skipped (not
# killed mid-flight) when compiles ran long.  Override: BENCH_TIME_BUDGET.
TIME_BUDGET_S = float(os.environ.get("BENCH_TIME_BUDGET", 1500.0))
_T_START = time.perf_counter()


def _left() -> float:
    return TIME_BUDGET_S - (time.perf_counter() - _T_START)


def _host_load() -> float:
    try:
        return os.getloadavg()[0] / max(os.cpu_count() or 1, 1)
    except OSError:
        return 0.0


def _with_retries(fn, what: str):
    """Run fn(), retrying on transient tunnel/compile errors with backoff."""
    for attempt in range(TRANSIENT_RETRIES):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - tunnel faults surface as varied types
            if attempt == TRANSIENT_RETRIES - 1 or _left() < RETRY_SLEEP_S:
                raise
            print(
                f"# {what}: attempt {attempt + 1} failed "
                f"({type(e).__name__}: {str(e)[:160]}); retrying in "
                f"{RETRY_SLEEP_S:.0f}s",
                flush=True,
            )
            time.sleep(RETRY_SLEEP_S)
    raise AssertionError("unreachable")


def main() -> None:
    from spfsplatv2_tpu.ops.covariance import build_covariance
    from spfsplatv2_tpu.ops.rasterizer import RasterizerConfig, render

    h = w = 256
    views = 2           # context views contributing Gaussians
    n_targets = 4       # rendered target views per scene per step
    g = views * h * w   # pixel-aligned Gaussians
    iters = 20          # device-side timing iterations per pass

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 8)
    # Pixel-aligned Gaussian cloud: one per pixel, pushed to depth 1-6.
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
    angles = jnp.linspace(-0.1, 0.1, n_targets)
    c2w = jnp.stack([jnp.eye(4).at[0, 3].set(float(a)) for a in angles])
    intr = jnp.stack([k] * n_targets)
    near = jnp.full((n_targets,), 1.0)
    far = jnp.full((n_targets,), 100.0)
    bg = jnp.zeros((n_targets, 3))
    target = jax.random.uniform(keys[6], (n_targets, h, w, 3))

    cfg = RasterizerConfig(
        backend="auto", scale_invariant=True, max_per_tile=2048, chunk=256,
        max_tiles_per_gaussian=16,
        # This scene projects ~1.47 live entries per gaussian (192k/131k,
        # r5_dissect); 1.75x leaves 19% headroom (n_overflow stays 0, and
        # overflow is an emitted metric, never silent).
        entry_budget=-(-int(1.75 * g) // 128) * 128,
        # Top-22-depth-bit sort key: ~equal order to exact rank (ties only
        # below 1e-4 relative depth), skips the double argsort.
        depth_key="quantized",
    )

    def loss_fn(means, covs, harmonics, opacities, c2w):
        out = render(
            c2w, intr, near, far, (h, w), bg,
            means, covs, harmonics, opacities, cfg=cfg,
        )
        return jnp.mean((out.color - target) ** 2)

    grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))

    def scanned(body):
        """Jit a timing loop: `iters` executions of body(...) inside one
        dispatch, novel inputs per iteration (tiny means perturbation: same
        binning statistics, different numerics), checksum carried out.

        All large arrays are jit ARGUMENTS — embedding them as closure
        constants (esp. the 37 MB SH tensor) SIGSEGVs the remote compile
        helper (round-3 finding, .claude/skills/verify/SKILL.md).
        """

        @jax.jit
        def run(seed, means, covs, harmonics, opacities, c2w):
            def step(acc, key):
                m = means + 1e-6 * jax.random.normal(
                    key, means.shape, means.dtype
                )
                return acc + body(m, covs, harmonics, opacities, c2w), None

            acc, _ = jax.lax.scan(
                step, jnp.zeros((), jnp.float32),
                jax.random.split(seed, iters),
            )
            return acc

        return run

    # Stage programs.  Import here so a stage-level failure can't kill the
    # headline (grad_fn) path.
    from spfsplatv2_tpu.ops.raster_common import project_gaussians
    from spfsplatv2_tpu.ops.raster_tiled import bin_gaussians_prefix

    def stage_binning(m, covs, harmonics, opacities, c2w):
        proj = project_gaussians(
            m, covs, harmonics, opacities, c2w[0], intr[0], (h, w),
            sh_degree=None, use_sh=True,
        )
        bins = bin_gaussians_prefix(
            proj, (h, w), cfg.max_tiles_per_gaussian, cfg.chunk,
            cfg.entry_budget,
            base_tiles_per_gaussian=cfg.base_tiles_per_gaussian,
            big_pool_factor=cfg.big_pool_factor, depth_key=cfg.depth_key,
        )
        return jnp.sum(bins.counts).astype(jnp.float32)

    def stage_fwd(m, covs, harmonics, opacities, c2w):
        out = render(
            c2w, intr, near, far, (h, w), bg,
            m, covs, harmonics, opacities, cfg=cfg,
        )
        # Checksum over EVERY camera's full output — a narrower checksum
        # lets XLA dead-code-eliminate the other cameras' pipelines.
        return jnp.sum(out.color) + jnp.sum(out.depth) + jnp.sum(out.alpha)

    def stage_fwd_bwd(m, covs, harmonics, opacities, c2w):
        grads = grad_fn(m, covs, harmonics, opacities, c2w)
        return jnp.sum(jnp.abs(grads[0][0])) + jnp.sum(jnp.abs(grads[4][0, 0]))

    programs = {
        "fwd_bwd": scanned(stage_fwd_bwd),     # the headline
        "fwd": scanned(stage_fwd),
        "binning_1cam": scanned(stage_binning),
    }

    def time_one(name, seed):
        """One timed pass: a single dispatch of the scanned program."""
        fn = programs[name]
        t0 = time.perf_counter()
        jax.block_until_ready(
            fn(jax.random.PRNGKey(seed), means, covs, harmonics, opacities,
               c2w)
        )
        return (time.perf_counter() - t0) / iters

    result = {
        "metric": "rasterizer_fwd_bwd_throughput",
        "unit": "Mpix/s",
        "config": {
            "image": [h, w], "views": views, "targets": n_targets,
            "gaussians": g, "iters_per_pass": iters,
            "backend": cfg.backend, "depth_key": cfg.depth_key,
            "base_tiles_per_gaussian": cfg.base_tiles_per_gaussian,
            "big_pool_factor": cfg.big_pool_factor,
            "entry_budget": cfg.entry_budget, "chunk": cfg.chunk,
            "timing": "device-side lax.scan, perturbed inputs, checksum fetch",
        },
    }

    # --- compile (warmup) ------------------------------------------------
    t0 = time.perf_counter()
    _with_retries(lambda: time_one("fwd_bwd", 0), "warmup/compile")
    result["init_s"] = round(time.perf_counter() - t0, 1)

    def emit():
        result["host_load"] = round(_host_load(), 2)
        result["budget_left_s"] = round(_left(), 1)
        print(json.dumps(result), flush=True)

    # --- headline: best of up to 4 passes (stalls only inflate time) -----
    best = _with_retries(lambda: time_one("fwd_bwd", 1), "pass 1")
    passes = 1
    result["value"] = round(n_targets * h * w / best / 1e6, 2)
    result["vs_baseline"] = round(
        result["value"] / REFERENCE_MPIX_S_ESTIMATE, 3
    )
    result["ms_per_camera"] = round(best / n_targets * 1e3, 2)
    result["passes"] = passes
    emit()  # headline survives any later failure/timeout
    for i in range(2, 5):
        if _left() < 60:
            break
        try:
            t = _with_retries(lambda: time_one("fwd_bwd", i), f"pass {i}")
        except Exception as e:  # noqa: BLE001 - keep the recorded headline
            print(f"# pass {i} abandoned: {type(e).__name__}: {e}", flush=True)
            break
        best = min(best, t)
        passes = i
        result["value"] = round(n_targets * h * w / best / 1e6, 2)
        result["vs_baseline"] = round(
            result["value"] / REFERENCE_MPIX_S_ESTIMATE, 3
        )
        result["ms_per_camera"] = round(best / n_targets * 1e3, 2)
        result["passes"] = passes
        emit()

    # --- stage split (self-diagnosis; best-effort) -----------------------
    stages = {}
    for name, div in (("fwd", n_targets), ("binning_1cam", 1)):
        if _left() < 90:
            break
        try:
            t = _with_retries(lambda: time_one(name, 0), f"stage {name}")
            t = min(t, _with_retries(lambda: time_one(name, 1), f"stage {name}"))
            stages[f"{name}_ms_per_camera"] = round(t / div * 1e3, 2)
        except Exception as e:  # noqa: BLE001
            stages[f"{name}_error"] = f"{type(e).__name__}: {e}"[:120]
    if stages:
        fwd = stages.get("fwd_ms_per_camera")
        if fwd is not None:
            stages["bwd_ms_per_camera"] = round(
                result["ms_per_camera"] - fwd, 2
            )
        result["stages"] = stages
        emit()

    # --- flagship train step at the reference config (b=16) --------------
    # Reference: config/experiment/spfsplatv2/re10k.yaml:38-52.  Best-effort;
    # the headline metric above never depends on it.
    if os.environ.get("BENCH_SKIP_TRAIN") != "1" and _left() > 300:
        try:
            from benchmarks.train_bench import run as train_run

            result.update(_with_retries(
                lambda: train_run(iters=5), "train bench",
            ))
        except Exception as e:  # noqa: BLE001 - report, don't fail the bench
            result["train_bench_error"] = f"{type(e).__name__}: {e}"[:200]
        emit()
    elif os.environ.get("BENCH_SKIP_TRAIN") != "1":
        result["train_bench_error"] = (
            f"skipped: {_left():.0f}s left of {TIME_BUDGET_S:.0f}s budget"
        )
        emit()


if __name__ == "__main__":
    main()
