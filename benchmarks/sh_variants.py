"""Micro-bench SH color eval variants at the bench workload scale.

The e2e profile shows the current einsum '...cs,...s->...c' over
(131072, 3, 25) coefficients lowering to (g, 1, 25) async channel slices
costing ~13.8 ms/call total in the fused fwd+bwd graph.  Candidates:

  v0: current eval_sh_colors (einsum)
  v1: flat (g, 75) multiply + (75, 3) selection-matrix matmul (MXU)
  v2: channel static slices of a pre-flattened (g, 75): 3 x [(g,25)*(g,25)].sum(-1)
  v3: batched matvec jnp.matmul(harm, basis[..., None])
  v4: per-term accumulation over (g,) columns of the flat (g, 75) table

All timings use the dependency-chained fori_loop harness (true_cost.py) —
naive dispatch loops get deduped by the axon tunnel and read ~0 ms.
Each variant is timed as value_and_grad of a sum (the fused fwd+bwd cost
that actually appears inside the rasterizer grad graph).

Run: timeout 2400 python -u benchmarks/sh_variants.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

G = 131072
DEG = 4
D_SH = 25


def chained_ms(op, init, n1=4, n2=12):
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
    from spfsplatv2_tpu.ops.sh import eval_sh_colors, sh_basis
    from spfsplatv2_tpu.ops import sh as shmod

    rng = np.random.default_rng(0)
    harm = jnp.asarray(rng.normal(size=(G, 3, D_SH)) * 0.3, jnp.float32)
    dirs = rng.normal(size=(G, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs, jnp.float32)

    sel = np.zeros((3 * D_SH, 3), np.float32)
    for c in range(3):
        sel[c * D_SH:(c + 1) * D_SH, c] = 1.0
    sel = jnp.asarray(sel)

    def v0(harm, dirs):
        return eval_sh_colors(harm, dirs, degree=DEG)

    def v1(harm, dirs):
        basis = sh_basis(dirs, DEG)                     # (g, 25)
        h75 = harm.reshape(G, 3 * D_SH)                 # (g, 75) c-major
        b75 = jnp.concatenate([basis] * 3, axis=-1)     # (g, 75)
        color = jnp.matmul(h75 * b75, sel)              # (g, 3) via MXU
        return jnp.maximum(color + 0.5, 0.0)

    def v2(harm, dirs):
        basis = sh_basis(dirs, DEG)
        h75 = harm.reshape(G, 3 * D_SH)
        chans = [
            jnp.sum(h75[:, c * D_SH:(c + 1) * D_SH] * basis, axis=-1)
            for c in range(3)
        ]
        color = jnp.stack(chans, axis=-1)
        return jnp.maximum(color + 0.5, 0.0)

    def v3(harm, dirs):
        basis = sh_basis(dirs, DEG)
        color = jnp.matmul(harm, basis[..., None])[..., 0]
        return jnp.maximum(color + 0.5, 0.0)

    def v4(harm, dirs):
        x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
        C1, C2, C3, C4 = shmod.C1, shmod.C2, shmod.C3, shmod.C4
        terms = [jnp.full_like(x, shmod.C0)]
        terms += [-C1 * y, C1 * z, -C1 * x]
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        terms += [C2[0] * xy, C2[1] * yz, C2[2] * (2 * zz - xx - yy),
                  C2[3] * xz, C2[4] * (xx - yy)]
        terms += [C3[0] * y * (3 * xx - yy), C3[1] * xy * z,
                  C3[2] * y * (4 * zz - xx - yy),
                  C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                  C3[4] * x * (4 * zz - xx - yy), C3[5] * z * (xx - yy),
                  C3[6] * x * (xx - 3 * yy)]
        terms += [C4[0] * xy * (xx - yy), C4[1] * yz * (3 * xx - yy),
                  C4[2] * xy * (7 * zz - 1), C4[3] * yz * (7 * zz - 3),
                  C4[4] * (zz * (35 * zz - 30) + 3), C4[5] * xz * (7 * zz - 3),
                  C4[6] * (xx - yy) * (7 * zz - 1),
                  C4[7] * xz * (xx - 3 * yy),
                  C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy))]
        h75 = harm.reshape(G, 3 * D_SH)
        chans = []
        for c in range(3):
            acc = jnp.zeros_like(x)
            for s, t in enumerate(terms):
                acc = acc + h75[:, c * D_SH + s] * t
            chans.append(acc)
        color = jnp.stack(chans, axis=-1)
        return jnp.maximum(color + 0.5, 0.0)

    ref = np.asarray(jax.jit(v0)(harm, dirs))
    for name, fn in [("v0_einsum", v0), ("v1_mxu75", v1),
                     ("v2_chan_static", v2), ("v3_matvec", v3),
                     ("v4_terms", v4)]:
        out = np.asarray(jax.jit(fn)(harm, dirs))
        err = np.abs(out - ref).max()

        def loss(h, d, fn=fn):
            return jnp.sum(fn(h, d))

        gfn = jax.value_and_grad(loss, argnums=(0, 1))

        # Chain: fold grads back into the inputs so every iter must run.
        def op(carry, gfn=gfn):
            h, d = carry
            val, (gh, gd) = gfn(h, d)
            return (h + 1e-12 * gh, d + 1e-12 * gd)

        fb = chained_ms(op, (harm, dirs))

        def op_fwd(carry, fn=fn):
            h, d = carry
            out = fn(h, d)
            return (h + 1e-12 * out[:, :, None], d)

        fwd = chained_ms(op_fwd, (harm, dirs))
        print(f"{name:16s} fwd {fwd:7.3f} ms  fwd+bwd {fb:7.3f} ms  "
              f"maxerr {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
